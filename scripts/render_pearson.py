"""Render a histogram of per-voxel pearson r (reference scripts/run.sh:20-55)."""

import sys
from pathlib import Path

import numpy as np


def main(path: str) -> None:
    pearson = np.load(path)
    out = Path(path).with_suffix(".png")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 4))
        plt.hist(pearson[np.isfinite(pearson)], bins=60, color="#4878a8")
        plt.axvline(float(np.nanmean(pearson)), color="#c44e52", label="mean")
        plt.xlabel("per-voxel pearson r")
        plt.ylabel("count")
        plt.legend()
        plt.tight_layout()
        plt.savefig(out, dpi=120)
        print(f"Wrote {out}")
    except ImportError:
        # matplotlib not in the image: print a text histogram instead
        finite = pearson[np.isfinite(pearson)]
        hist, edges = np.histogram(finite, bins=20)
        peak = hist.max() or 1
        for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
            print(f"{lo:+.3f}..{hi:+.3f} | {'#' * int(40 * h / peak)} {h}")
        print(f"mean={np.nanmean(pearson):.4f} max={np.nanmax(pearson):.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
