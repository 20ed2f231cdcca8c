"""Event extraction and feature preparation drivers.

Rebuild of reference data_utils/data_utils/helpers.py:18-106.
"""

from __future__ import annotations

import concurrent.futures
import logging
import typing as tp

import pandas as pd

from ..core import events as events_mod
from ..core import segments as segments_mod

logger = logging.getLogger(__name__)

TypesParam = tp.Union[
    str, tp.Sequence[str], tp.Type[events_mod.Event], events_mod.EventTypesHelper
]


def extract_events(
    obj: tp.Any, types: TypesParam | None = None
) -> list[events_mod.Event]:
    """Normalize DataFrame/Segment/Event containers into a list of Events."""
    helper: events_mod.EventTypesHelper | None = None
    if isinstance(types, events_mod.EventTypesHelper):
        helper = types
    elif types is not None:
        helper = events_mod.EventTypesHelper(types)

    if isinstance(obj, (list, tuple)):
        if not obj:
            return []
        if isinstance(obj[0], events_mod.Event):
            if helper is not None:
                obj = [e for e in obj if isinstance(e, helper.classes)]
            return list(obj)
    if isinstance(obj, pd.DataFrame):
        if helper is not None:
            obj = obj.loc[obj.type.isin(helper.names), :]
        unknown = set(obj.type) - set(events_mod.Event._CLASSES)
        if unknown:
            logger.warning("Ignoring unknown event types: %s", unknown)
            obj = obj.loc[~obj.type.isin(unknown), :]
        num = len(obj)
        iterable = (
            (obj.iloc[k, :] for k in range(num)) if num <= 2 else obj.itertuples()
        )
        out = [events_mod.Event.from_dict(r) for r in iterable]
        for i, e in zip(obj.index, out):
            e._index = i
        return out
    if isinstance(obj, events_mod.Event):
        obj = [obj]
    elif isinstance(obj, dict):
        obj = [events_mod.Event.from_dict(obj)]
    if not isinstance(obj, (list, tuple)):
        raise NotImplementedError(f"Conversion of {type(obj)} is not supported")
    if not obj:
        return []
    if isinstance(obj[0], segments_mod.Segment):
        event_dict: dict[int, events_mod.Event] = {}
        for segment in obj:
            event_dict.update({id(e): e for e in segment.ns_events})
        obj = list(event_dict.values())
    if not isinstance(obj[0], events_mod.Event):
        raise NotImplementedError(f"Unexpected list of {type(obj[0])}")
    return extract_events(obj, types=helper)


def prepare_features(
    features: list[tp.Any] | dict[str, tp.Any],
    events: tp.Any,
) -> None:
    """Run prepare() for each feature; remote-placed features in threads."""
    events = extract_events(events)
    feature_list = list(features.values()) if isinstance(features, dict) else features
    remote = [
        f
        for f in feature_list
        if getattr(getattr(f, "infra", None), "cluster", None) == "external"
    ]
    local = [f for f in feature_list if f not in remote]
    with concurrent.futures.ThreadPoolExecutor() as executor:
        futures = {}
        for feature in remote:
            fut = executor.submit(feature.prepare, events)
            futures[fut] = type(feature).__name__
        for feature in local:
            logger.info("Preparing feature: %s", type(feature).__name__)
            feature.prepare(events)
        for future in concurrent.futures.as_completed(futures):
            try:
                future.result()
            except Exception as e:
                logger.warning(
                    "Error preparing feature %s: %s", futures[future], e
                )
                raise
