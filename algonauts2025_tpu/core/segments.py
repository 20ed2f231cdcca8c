"""Segmentation: fixed training windows over event timelines.

Rebuild of reference data_utils/data_utils/segments.py.  Windows are
``WINDOW_SECONDS`` long with the same stride, shifted by ``-HEMODYNAMIC_LAG``
seconds to account for the BOLD response delay (reference
segments.py:168-179: 149 s windows, 4.47 s = 3 TR lag).

All of this is host-side NumPy: window selection is ragged/dynamic and must
stay out of jit; the device sees only the fixed-shape tensors produced by
features pooled over these windows.
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import typing as tp
import warnings

import numpy as np
import pandas as pd

from .events import Event, warn_once

logger = logging.getLogger(__name__)

#: Hemodynamic lag in seconds (3 TRs at TR=1.49 s).
HEMODYNAMIC_LAG = 4.47
#: Training window length and stride, in seconds.
WINDOW_SECONDS = 149.0


@dataclasses.dataclass
class Segment:
    """A [start, start+duration) window plus the events overlapping it."""

    start: float
    duration: float
    _index: np.ndarray
    ns_events: tp.List[Event] = dataclasses.field(default_factory=list)
    _trigger: float | tp.Dict[str, tp.Any] | None = None

    @property
    def events(self) -> pd.DataFrame:
        if not self.ns_events:
            raise RuntimeError(f"ns_events was not populated in {self}")
        if len(self.ns_events) != len(self._index):
            raise RuntimeError(
                f"Cannot recreate events dataframe (segment={self})"
            )
        return pd.DataFrame(
            index=self._index, data=[e.to_dict() for e in self.ns_events]
        )

    @property
    def stop(self) -> float:
        return self.start + self.duration

    def subsegment(self, start: float, duration: float) -> "Segment":
        assert start >= 0, "start is relative to the segment start"
        new_start = self.start + start
        new_index, new_events = [], []
        for i, e in enumerate(self.ns_events):
            if e.start <= new_start + duration and e.start + e.duration >= new_start:
                new_index.append(self._index[i])
                new_events.append(e)
        return Segment(
            start=new_start,
            duration=duration,
            _index=np.array(new_index),
            ns_events=new_events,
            _trigger=self._trigger,
        )


def _validate_event(event: pd.Series) -> dict[str, tp.Any]:
    event_type = event["type"]
    lower = {x.lower() for x in Event._CLASSES}
    if event_type in Event._CLASSES:
        event_class = Event._CLASSES[event_type]
        event_obj = event_class.from_dict(event).to_dict()
        return {**event, **event_obj}
    if event_type in lower:
        raise ValueError(f"Legacy uncapitalized event {event}")
    warn_once(
        f'Unexpected type "{event_type}". Add a new Event subclass in '
        "algonauts2025_tpu.core.events to support it."
    )
    return {**event}


def validate_events(events: pd.DataFrame) -> pd.DataFrame:
    """Normalize, type-check and sort an events DataFrame.

    Ensures a "type" column of strings, round-trips every row through its
    Event class, sorts within each timeline by (start asc, duration desc)
    and adds a "stop" column.
    """
    if events.empty:
        return events.copy()
    msg = 'events DataFrame must have a "type" column with strings'
    if "type" not in events.keys():
        raise ValueError(msg)
    types = events["type"].unique()
    if not all(isinstance(typ, str) for typ in types):
        raise ValueError(msg)

    df = pd.DataFrame(
        events.apply(_validate_event, axis=1).tolist(), index=events.index
    )
    null = df.loc[df.duration <= 0, :]
    if not null.empty:
        warnings.warn(
            f"Found {len(null)} event(s) with null duration "
            f"(types: {null['type'].unique()})"
        )
    dfs = []
    for _, sub in df.groupby(by="timeline", sort=False):
        dfs.append(
            sub.sort_values(
                by=["start", "duration"], ascending=[True, False], ignore_index=True
            )
        )
    important = ["type", "start", "duration", "timeline"]
    df = pd.concat(dfs, ignore_index=True)
    columns = important + [c for c in df.columns if c not in important]
    df = df.loc[:, columns]
    df = df.assign(stop=lambda x: x.start + x.duration)
    return df


def _prepare_strided_windows(
    start: float,
    stop: float,
    stride: float,
    duration: float,
    drop_incomplete: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    eps = 1e-8
    if drop_incomplete:
        stop -= duration
    starts = np.arange(start, stop + eps, stride)
    durations = np.full_like(starts, fill_value=duration)
    return starts, durations


class SegmentCreator:
    """Per-timeline event index used to cut windows into Segments."""

    def __init__(self, events: list[Event]) -> None:
        timelines = {e.timeline for e in events}
        if len(timelines) > 1:
            raise ValueError(
                f"Cannot create {type(self).__name__} on several timelines, "
                f"got {timelines}"
            )
        self.events = np.array(events)
        self.starts = np.array([e.start for e in events])
        self.indices = np.array([e._index for e in events])
        self.stops = np.array([e.duration for e in events]) + self.starts

    @classmethod
    def from_obj(cls, obj: tp.Any) -> dict[str, "SegmentCreator"]:
        from ..data import helpers

        timeline_events: dict[str, list[Event]] = collections.defaultdict(list)
        for e in helpers.extract_events(obj):
            timeline_events[e.timeline].append(e)
        timelines = list(timeline_events)
        if isinstance(obj, pd.DataFrame):
            timelines = list(obj.timeline.unique())
        return {tl: cls(timeline_events[tl]) for tl in timelines}

    def select(self, start: float, duration: float) -> Segment:
        select = self.starts < start + duration
        select &= self.stops > start
        events = list(self.events[select])
        index = self.indices[select]
        return Segment(ns_events=events, start=start, duration=duration, _index=index)


def iter_segments(
    events: pd.DataFrame,
    *,
    start_jitter: float = 0.0,
) -> tp.Iterator[Segment]:
    """Cut each timeline into lag-shifted fixed windows.

    ``start_jitter`` shifts every window start (used by the JitterWindows
    training callback; reference callbacks.py:25-44).
    """
    creators = SegmentCreator.from_obj(events)
    for creator in creators.values():
        starts, durations = _prepare_strided_windows(
            creator.starts.min() - HEMODYNAMIC_LAG + start_jitter,
            creator.stops.max() - HEMODYNAMIC_LAG + start_jitter,
            WINDOW_SECONDS,
            WINDOW_SECONDS,
            drop_incomplete=False,
        )
        for start_, duration_ in zip(starts, durations):
            seg = creator.select(start=start_, duration=duration_)
            seg._trigger = start_
            yield seg


def list_segments(events: pd.DataFrame) -> list[Segment]:
    return list(iter_segments(events))


def find_enclosed(df: pd.DataFrame, start: float, duration: float) -> pd.Series:
    estart = np.array(df.start)
    estop = estart + np.array(df.duration)
    is_enclosed = np.logical_and(estart >= start, estop <= start + duration)
    return pd.Series(df.index[is_enclosed])


def find_overlap(
    events: pd.DataFrame, *, start: float = 0.0, duration: float | None = None
) -> pd.Series:
    assert duration is not None
    assert events.timeline.nunique() == 1
    has_overlap = (events.start >= start) & (events.start < start + duration)
    has_overlap |= (events.start + events.duration > start) & (
        events.start + events.duration <= start + duration
    )
    has_overlap |= (events.start <= start) & (
        events.start + events.duration >= start + duration
    )
    return pd.Series(events.index[has_overlap])
