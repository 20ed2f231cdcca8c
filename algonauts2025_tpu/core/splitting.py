"""Deterministic split assignment and event chunking.

Rebuild of reference data_utils/data_utils/splitting.py.  The splitter must
stay bit-identical across processes and hosts (it defines the train/val
partition and therefore cache identity), hence the sha256 -> Random -> cdf
construction is preserved exactly.
"""

from __future__ import annotations

import hashlib
import random
import typing as tp
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import events as event_module


@dataclass
class DeterministicSplitter:
    """Hash a uid into a split name with fixed ratios (reference splitting.py:18-40)."""

    ratios: tp.Dict[str, float]
    seed: float = 0.0

    def __post_init__(self) -> None:
        assert all(ratio > 0 for ratio in self.ratios.values())
        assert np.allclose(sum(self.ratios.values()), 1.0), (
            f"the sum of ratios must be equal to 1. got {self.ratios}"
        )

    def __call__(self, uid: str) -> str:
        hashed = int(hashlib.sha256(uid.encode()).hexdigest(), 16)
        rng = random.Random(hashed + self.seed)
        score = rng.random()
        cdf = np.cumsum(list(self.ratios.values()))
        names = list(self.ratios.keys())
        for idx, cdf_val in enumerate(cdf):
            if score < cdf_val:
                return names[idx]
        raise ValueError


def chunk_events(
    events: pd.DataFrame,
    event_type_to_chunk: tp.Literal["Sound", "Video"],
    event_type_to_use: str | None = None,
    min_duration: float | None = None,
    max_duration: float = np.inf,
) -> pd.DataFrame:
    """Split long media events into <= max_duration pieces.

    Mirrors reference splitting.py:43-106: per timeline, timepoints are
    either a regular max_duration grid or derived from split-section
    boundaries of ``event_type_to_use`` events.
    """
    added_events: tp.List[tp.Dict] = []
    dropped_rows: tp.List[int] = []
    ns_event_type_to_chunk = getattr(event_module, event_type_to_chunk)
    assert hasattr(
        ns_event_type_to_chunk, "_split"
    ), f"Event type {event_type_to_chunk} is not splittable"
    if event_type_to_use is not None:
        assert "split" in events.columns, "Events must have a split column"

    for _, df in events.groupby("timeline"):
        df = df.sort_values("start")
        if event_type_to_use is None:
            timepoints: list[float] = np.arange(
                df.start.min(), df.stop.max(), max_duration
            ).tolist()
            if min_duration is not None:
                if df.stop.max() - timepoints[-1] < min_duration:
                    timepoints = timepoints[:-1]
        else:
            timepoints = []
            events_to_use = df.loc[df.type == event_type_to_use].copy()
            previous = events_to_use.copy().shift(1)
            split_change = events_to_use.split.astype(str) != previous.split.astype(str)
            events_to_use["section"] = np.cumsum(split_change.values)
            for _, section in events_to_use.groupby("section"):
                start, end = (
                    section.iloc[0].start,
                    section.iloc[-1].start + section.iloc[-1].duration,
                )
                timepoints.extend(np.arange(start, end, max_duration))

        events_to_chunk = df.loc[df.type == event_type_to_chunk]
        dropped_rows.extend(events_to_chunk.index)
        for row in events_to_chunk.itertuples():
            event_to_chunk = ns_event_type_to_chunk.from_dict(row)
            new_events = event_to_chunk._split(
                [t - event_to_chunk.start for t in timepoints], min_duration
            )
            for new_event in new_events:
                new_event_dict = new_event.to_dict()
                for k, v in row._asdict().items():
                    if k not in new_event_dict:
                        new_event_dict[k] = v
                added_events.append(new_event_dict)

    out_events = events.copy()
    out_events = out_events.drop(dropped_rows)
    out_events = pd.concat([out_events, pd.DataFrame(added_events)])
    out_events = out_events.reset_index(drop=True)
    return out_events
