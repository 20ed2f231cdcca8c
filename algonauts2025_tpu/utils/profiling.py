"""Tracing and per-stage timing (the reference has none; SURVEY §5 adds it).

Two tools:
- ``trace(logdir)``: capture a jax.profiler trace (TensorBoard/XProf
  format) around a code region — device timelines, HLO costs, transfers.
- ``StageTimer``: lightweight wall-clock accounting for host pipeline
  stages (decode, pooling, H2D, ...), the usual hidden bottleneck of the
  input pipeline.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
import typing as tp
from collections import defaultdict
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(logdir: str | Path) -> tp.Iterator[None]:
    """jax.profiler trace around a region (no-op if profiling unavailable)."""
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(str(logdir))
        started = True
    except Exception as e:  # some remote attachments don't support tracing
        logger.warning("jax.profiler.start_trace failed: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            logger.info("Wrote profiler trace to %s", logdir)


class StageTimer:
    """Accumulates wall-clock per named stage; dumps a JSON summary."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> tp.Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def wrap(self, name: str, iterable: tp.Iterable) -> tp.Iterator:
        """Attribute the time spent *producing* each item to ``name``."""
        it = iter(iterable)
        while True:
            t0 = time.perf_counter()
            try:
                item = next(it)
            except StopIteration:
                return
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            yield item

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(1, self.counts[name]), 6),
            }
            for name in sorted(self.totals)
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))

    def log(self) -> None:
        for name, stats in self.summary().items():
            logger.info(
                "stage %-24s total=%.3fs n=%d mean=%.2fms",
                name,
                stats["total_s"],
                stats["count"],
                stats["mean_s"] * 1e3,
            )
