"""Event extraction and feature preparation drivers.

Behavioral spec from reference data_utils/data_utils/helpers.py:18-106,
re-derived: ``extract_events`` normalizes any event container (DataFrame,
Segment list, Event list, dict) into a flat list of Event objects with an
optional type filter; ``prepare_features`` runs each feature's bulk
``prepare`` pass, overlapping externally-scheduled features in threads.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import Future, ThreadPoolExecutor, as_completed
from typing import Any, Dict, List, Optional, Sequence, Type, Union

import pandas as pd

from ..core.events import Event, EventTypesHelper
from ..core.segments import Segment

logger = logging.getLogger(__name__)

TypesParam = Union[str, Sequence[str], Type[Event], EventTypesHelper]


def _as_helper(types: Optional[TypesParam]) -> Optional[EventTypesHelper]:
    if types is None or isinstance(types, EventTypesHelper):
        return types
    return EventTypesHelper(types)


def _events_from_frame(
    df: pd.DataFrame, helper: Optional[EventTypesHelper]
) -> List[Event]:
    """DataFrame rows -> Event objects, skipping unregistered types."""
    if helper is not None:
        df = df.loc[df["type"].isin(helper.names)]
    strays = set(df["type"]) - Event._CLASSES.keys()
    if strays:
        logger.warning("dropping rows with unregistered event types: %s", strays)
        df = df.loc[~df["type"].isin(strays)]
    events = []
    for df_index, record in zip(df.index, df.to_dict(orient="records")):
        event = Event.from_dict(record)
        event._index = df_index
        events.append(event)
    return events


def _dedup_segment_events(segments: Sequence[Segment]) -> List[Event]:
    """Each distinct Event object once, in first-seen order."""
    seen: Dict[int, Event] = {}
    for segment in segments:
        for event in segment.ns_events:
            seen.setdefault(id(event), event)
    return list(seen.values())


def _as_event_list(obj: Any) -> List[Event]:
    """Coerce any supported container shape into a flat list of Events."""
    if isinstance(obj, (list, tuple)):
        items = list(obj)
        if items and isinstance(items[0], Segment):
            items = _dedup_segment_events(items)
        head = items[0] if items else None
        if head is not None and not isinstance(head, Event):
            raise NotImplementedError(f"unsupported event list payload: {type(head)}")
        return items
    if isinstance(obj, Event):
        return [obj]
    if isinstance(obj, dict):
        return [Event.from_dict(obj)]
    raise NotImplementedError(f"unsupported event container: {type(obj)}")


def extract_events(obj: Any, types: Optional[TypesParam] = None) -> List[Event]:
    """Normalize DataFrame/Segment/Event containers into a list of Events."""
    helper = _as_helper(types)
    if isinstance(obj, pd.DataFrame):
        return _events_from_frame(obj, helper)
    items = _as_event_list(obj)
    if helper is None:
        return items
    return [e for e in items if isinstance(e, helper.classes)]


def prepare_features(
    features: Union[List[Any], Dict[str, Any]],
    events: Any,
    overlap: Optional[bool] = None,
) -> None:
    """Run ``prepare()`` for every feature.

    Features whose infra places them on an external cluster are submitted
    to a thread pool first so their remote work overlaps the local passes
    (reference helpers.py:66-106 semantics).

    ``overlap=True`` (the default; set ``ALGONAUTS_OVERLAP_PREPARE=0`` to
    disable) additionally runs the LOCAL features concurrently.  Device
    compute serializes on the accelerator queue either way, but each
    feature's host work (video decode, tokenization, wav parse, disk
    cache writes) and its device->host result fetches ride under the
    other features' device compute — measured fully concurrent on the
    remote-TPU tunnel (scripts/probe_overlap.py: an 11.4 MB D2H fetch
    under a saturated device costs the same as against an idle one, and
    leaves the device timeline untouched).  Per-feature caches are
    independent files, so results are identical to the serial order.
    """
    events = extract_events(events)
    if isinstance(features, dict):
        features = list(features.values())
    todo = list(features)
    if overlap is None:
        overlap = os.environ.get("ALGONAUTS_OVERLAP_PREPARE", "1") != "0"

    def _is_external(feature: Any) -> bool:
        infra = getattr(feature, "infra", None)
        return getattr(infra, "cluster", None) == "external"

    try:
        with ThreadPoolExecutor(max_workers=max(1, len(todo))) as pool:
            pending: Dict[Future, str] = {}
            for feature in todo:
                if _is_external(feature) or overlap:
                    logger.info("Preparing feature (overlapped): %s", type(feature).__name__)
                    pending[pool.submit(feature.prepare, events)] = type(feature).__name__
            for feature in todo:
                if _is_external(feature) or overlap:
                    continue
                logger.info("Preparing feature: %s", type(feature).__name__)
                feature.prepare(events)
            for done in as_completed(pending):
                exc = done.exception()
                if exc is not None:
                    logger.warning("Error preparing feature %s: %s", pending[done], exc)
                    raise exc
    finally:
        # drop lazily-built backbones so their device params (~10 GB for the
        # three full-size frozen models on a cold run) do not squat HBM
        # through training — including when one feature's prepare raised and
        # the caller retries (the others' backbones are already resident).
        # Injected backbones (set_backbone) are kept; a later cache miss
        # rebuilds transparently.
        for feature in todo:
            release = getattr(feature, "release_backbone", None)
            if callable(release):
                release()
