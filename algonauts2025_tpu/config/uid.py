"""Config-hash identity for caches and tasks.

The reference derives cache identity from pydantic config contents with
per-class exclusions so that e.g. ``device`` or ``layers`` changes don't
invalidate feature caches (reference features/text.py:153-158,
audio.py:200-205, video.py:169-170, neuro.py:110-113).  This module
provides the same contract for the TPU build.
"""

from __future__ import annotations

import hashlib
import json
import math
import typing as tp

import pydantic

__all__ = ["config_uid", "dump_for_uid"]


def _normalize(value: tp.Any) -> tp.Any:
    if isinstance(value, dict):
        return {str(k): _normalize(v) for k, v in sorted(value.items())}
    if isinstance(value, (list, tuple)):
        return [_normalize(v) for v in value]
    if isinstance(value, float):
        if not math.isfinite(value):
            return repr(value)  # 'inf'/'nan': json-safe and deterministic
        if value == int(value) and abs(value) < 1e12:
            return int(value)  # 2.0 and 2 are the same config value
        return value
    if isinstance(value, pydantic.BaseModel):
        return _normalize(value.model_dump())
    return value


def dump_for_uid(
    model: pydantic.BaseModel, exclude: tp.Collection[str] = ()
) -> dict[str, tp.Any]:
    """model_dump with exclusions applied, plus instance/class-level
    ``_exclude_from_cache_uid`` / ``_exclude_from_cls_uid`` hooks."""
    excluded = set(exclude)
    hook = getattr(model, "_exclude_from_cache_uid", None)
    if callable(hook):
        excluded.update(hook())
    cls_hook = getattr(type(model), "_exclude_from_cls_uid", None)
    if callable(cls_hook):
        excluded.update(cls_hook())
    data = model.model_dump(mode="json")
    for field in excluded:
        data.pop(field, None)
    data.pop("infra", None)  # infra placement never affects results
    return _normalize(data)


def config_uid(
    model: pydantic.BaseModel,
    exclude: tp.Collection[str] = (),
    version: str = "",
) -> str:
    """Stable short uid for a pydantic config."""
    data = dump_for_uid(model, exclude)
    payload = json.dumps({"cfg": data, "version": version}, sort_keys=True, default=str)
    name = type(model).__name__
    return f"{name}-{hashlib.sha256(payload.encode()).hexdigest()[:16]}"
