"""Ensemble submission averaging (reference grids/average_submissions.py).

Loads all per-run submission zips under a grid folder, optionally selects
the k most diverse predictors on a prediction correlation matrix, and
writes a softmax-weighted (per-run score or per-voxel pearson) average
submission.  Pure NumPy host-side post-processing.
"""

from __future__ import annotations

import logging
import os
import zipfile
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

__all__ = ["average_submissions", "select_diverse_subset", "get_k_most_diverse_indices"]


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def select_diverse_subset(corr: np.ndarray, k: int) -> list[int]:
    """Greedy min-total-|corr| selection of k indices."""
    n = corr.shape[0]
    selected = [int(np.argmin(np.sum(np.abs(corr), axis=0)))]
    while len(selected) < k:
        candidates = sorted(set(range(n)) - set(selected))
        scores = [
            (c, sum(abs(corr[c, s]) for s in selected)) for c in candidates
        ]
        selected.append(min(scores, key=lambda x: x[1])[0])
    return selected


def get_k_most_diverse_indices(predictions: list[dict], k: int) -> np.ndarray:
    preds = []
    first_sub = next(iter(predictions[0]))
    for chunk in predictions[0][first_sub]:
        preds.append(np.array([data[first_sub][chunk] for data in predictions]))
    stacked = np.concatenate(preds, axis=1).reshape(len(predictions), -1)
    corr = np.corrcoef(stacked)
    return np.array(select_diverse_subset(corr, k))


def _load_submission(path: str):
    try:
        with zipfile.ZipFile(path) as zf:
            name = zf.namelist()[0]
            with zf.open(name) as f:
                submission = np.load(f, allow_pickle=True).item()
    except Exception:
        logger.warning("Error loading submission from %s", path)
        return None
    metrics = pd.read_csv(path.replace("submission.zip", "metrics.csv"))
    pearson_path = path.replace("submission.zip", "pearson.npy")
    pearson = np.load(pearson_path) if os.path.exists(pearson_path) else None
    return submission, metrics, pearson


def average_submissions(
    grid_path: Path,
    weigh_by_score: bool = False,
    per_voxel_weights: bool = False,
    temperature: float = 1.0,
    max_runs: int | None = None,
    k_most_diverse: int | None = None,
) -> Path:
    grid_path = Path(grid_path)
    paths = []
    for folder in sorted(os.listdir(grid_path)):
        if max_runs is not None and len(paths) == max_runs:
            break
        sub = grid_path / folder / "submission.zip"
        if sub.exists():
            paths.append(str(sub))
    logger.info("Found %d submissions", len(paths))
    if not paths:
        raise RuntimeError(f"No submissions under {grid_path}")

    predictions, scores, pearsons = [], [], []
    with ThreadPoolExecutor(max_workers=10) as ex:
        futures = {ex.submit(_load_submission, p): p for p in paths}
        for fut in as_completed(futures):
            out = fut.result()
            if out is None:
                continue
            predictions.append(out[0])
            scores.append(out[1])
            pearsons.append(out[2])

    if k_most_diverse is not None:
        idx = get_k_most_diverse_indices(predictions, k_most_diverse)
        predictions = [predictions[i] for i in idx]
        scores = [scores[i] for i in idx]
        pearsons = [pearsons[i] for i in idx]

    if per_voxel_weights:
        stacked = np.stack(pearsons) / temperature  # (n_runs, n_voxels)
        weights = _softmax(stacked, axis=0)[:, None, :]  # broadcast over time
    else:
        vals = np.array([s["val/pearson"].item() for s in scores])
        weights = _softmax(vals / temperature)[:, None, None]

    averaged: dict[str, dict[str, np.ndarray]] = defaultdict(dict)
    for sub in predictions[0].keys():
        for chunk in predictions[0][sub].keys():
            preds = np.array([data[sub][chunk] for data in predictions])
            if weigh_by_score:
                averaged[sub][chunk] = np.sum(preds * weights, axis=0)
            else:
                averaged[sub][chunk] = np.mean(preds, axis=0)

    out_path = grid_path / "submission.npy"
    np.save(out_path, dict(averaged))  # type: ignore[arg-type]
    with zipfile.ZipFile(out_path.with_suffix(".zip"), "w") as zipf:
        zipf.write(out_path, arcname=out_path.name)
    logger.info("Saved average submission to %s", out_path.with_suffix(".zip"))
    return out_path.with_suffix(".zip")


if __name__ == "__main__":
    from .defaults import SAVEDIR

    average_submissions(
        grid_path=Path(SAVEDIR) / "model_soup",
        weigh_by_score=True,
        per_voxel_weights=True,
        temperature=0.3,
    )
