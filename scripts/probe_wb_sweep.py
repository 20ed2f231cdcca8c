"""Sweep the video window_batch (BENCH_WB) on the real chip.

wb amortizes per-dispatch overhead (kernel launch chains, lax.map head
chunking, pipeline bubbles) against VMEM/HBM pressure.  wb=4 is the
r3-validated default; this measures 4/6/8 on the production stage loop
(bench.bench_video) with the int8-calibrated backbone to see whether a
bigger batch buys anything now that the stage is the whole headline.

Run attached to the chip: python scripts/probe_wb_sweep.py
"""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import numpy as np

os.environ.setdefault("BENCH_PASSES", "2")


def main() -> None:
    import jax

    import bench

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    stim = float(os.environ.get("BENCH_STIM_SECONDS", 30))
    tmp = Path(tempfile.mkdtemp(prefix="wb_sweep_"))
    from algonauts2025_tpu.data.synthetic import _write_video

    rng = np.random.default_rng(0)
    video_path = tmp / "stim.mkv"
    assert _write_video(video_path, stim, rng, fps=24)

    backbone = bench.build_video_backbone()
    for wb in (4, 6, 8):
        os.environ["BENCH_WB"] = str(wb)
        t0 = time.time()
        dt = bench.bench_video(video_path, backbone)
        print(
            f"wb={wb}: video stage {dt:.3f}s "
            f"({dt / (2 * stim) * 1e3:.0f} ms/window; incl. compile {time.time() - t0:.0f}s wall)",
            flush=True,
        )


if __name__ == "__main__":
    main()
