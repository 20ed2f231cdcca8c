"""Study loading: timeline discovery -> event DataFrames -> enhancer chain.

Rebuild of reference data_utils/data_utils/data.py.  A study is a set of
(subject, timeline) recordings; each timeline loads its raw events, the
StudyLoader concatenates them, runs the enhancer pipeline and caches the
result (parquet) keyed by config hash.

The ``TIMELINES`` registry lets ``method:`` URIs inside events dispatch
reads back to their owning timeline object (reference data.py:36,84).
"""

from __future__ import annotations

import logging
import typing as tp
from collections import OrderedDict
from pathlib import Path

import pandas as pd
import pydantic

from ..cache.frame_store import FrameStore
from ..config.uid import config_uid
from ..core.events import StrCast
from ..core.segments import validate_events
from .enhancers import Enhancer

logger = logging.getLogger(__name__)

PathLike = tp.Union[str, Path]

TIMELINES: tp.Dict[str, "BaseData"] = {}

_STUDIES: tp.Dict[str, tp.Type["BaseData"]] = {}


def _compress_string(file_: str) -> str:
    import hashlib
    import re

    def hash_(s: str) -> str:
        return hashlib.sha256(s.encode()).hexdigest()[:10]

    file_ = str(file_)
    fname = Path(file_).name
    valid = re.sub(r"[^a-zA-Z0-9.\-_]", "", fname)
    if len(fname) > 70:
        valid = "_".join([valid[:20], hash_(fname), valid[-20:]])
    folder = str(Path(file_).parent)
    if folder != "." or valid != fname:
        valid = f"{hash_(file_)}_{valid}"
    return valid


class BaseData(pydantic.BaseModel):
    """One (subject, timeline) recording of a study."""

    subject: StrCast
    path: PathLike
    timeline: str = ""

    version: tp.ClassVar[str] = "v1"
    study: tp.ClassVar[str] = ""

    def __init_subclass__(cls) -> None:
        super().__init_subclass__()
        _STUDIES[cls.__name__] = cls

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if not self.timeline:
            excludes = ("path", "timeline")
            timeline = type(self).__name__
            for name in type(self).model_fields:
                if name in excludes:
                    continue
                timeline += f"_{name}-{getattr(self, name)}"
            self.timeline = _compress_string(timeline)
        TIMELINES[self.timeline] = self

    @classmethod
    def _iter_timelines(cls, path: Path) -> tp.Iterator["BaseData"]:
        raise NotImplementedError

    @tp.final
    @classmethod
    def iter_timelines(cls, path: PathLike) -> tp.Iterator["BaseData"]:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        study = cls.__name__
        if path.name.lower() != study.lower():
            for name in (study, study.lower()):
                if (path / name).exists():
                    path = path / name
                    break
        found = False
        for tl in cls._iter_timelines(path):
            found = True
            yield tl
        if not found:
            raise RuntimeError(f"No timeline found for {study} in {path}")

    def _load_events(self) -> pd.DataFrame:
        raise NotImplementedError

    @tp.final
    def load(self) -> pd.DataFrame:
        events = self._load_events()
        for col in ["subject", "timeline"]:
            if col in events:
                raise ValueError(f"Column {col} already exists in events dataframe")
            events[col] = getattr(self, col)
        events["study"] = type(self).__name__
        return validate_events(events)


class StudyInfra(pydantic.BaseModel):
    """Caching config for the study build (parquet event cache)."""

    model_config = pydantic.ConfigDict(extra="forbid")
    folder: str | Path | None = None
    mode: tp.Literal["cached", "force"] = "cached"
    version: str = "1"
    cluster: tp.Optional[str] = None


class StudyLoader(pydantic.BaseModel):
    """Builds the full (enhanced) events DataFrame for a study."""

    model_config = pydantic.ConfigDict(extra="forbid")

    path: PathLike
    study: str = "Algonauts2025"
    query: str | None = None
    enhancers: tp.List[Enhancer] | OrderedDict[str, Enhancer] = []
    infra: StudyInfra = StudyInfra()
    cache_all_timelines: bool = True

    _timelines: tp.List[BaseData] | None = None

    def _exclude_from_cache_uid(self) -> tp.List[str]:
        return ["path", "query", "cache_all_timelines"]

    def study_cls(self) -> tp.Type[BaseData]:
        from . import algonauts  # noqa: F401  (registers the study)

        return _STUDIES[self.study]

    def iter_timelines(self) -> tp.Iterator[BaseData]:
        if self._timelines is None:
            self._timelines = list(self.study_cls().iter_timelines(self.path))
        else:
            for tl in self._timelines:
                TIMELINES[tl.timeline] = tl
        return iter(self._timelines)

    def study_summary(self, apply_query: bool = True) -> pd.DataFrame:
        out = pd.DataFrame([dict(tl) for tl in self.iter_timelines()])
        out["subject"] = out.subject.apply(lambda x: f"{self.study}/{x}")
        for n in ("subject_index", "timeline_index"):
            if n in out.columns:
                raise RuntimeError(f"Study dataframes may not contain {n}")
        groups = out.groupby("subject")
        out.loc[:, "subject_index"] = groups.ngroup()
        out.loc[:, "subject_timeline_index"] = groups.cumcount()
        out.loc[:, "timeline_index"] = out.index
        if apply_query and self.query is not None:
            out = out.query(self.query)
        return out

    def _store(self) -> FrameStore | None:
        if self.infra.folder is None:
            return None
        uid = config_uid(self, version=self.infra.version)
        store = FrameStore(Path(self.infra.folder) / uid / "events")
        if self.infra.mode == "force":
            store.clear()
        return store

    def _load_timeline(self, tl: BaseData, store: FrameStore | None) -> pd.DataFrame:
        TIMELINES[tl.timeline] = tl
        if store is not None and tl.timeline in store:
            return store[tl.timeline]
        out = tl.load()
        out.subject = f"{self.study}/{tl.subject}"
        if store is not None:
            store[tl.timeline] = out
        return out

    def build(self) -> pd.DataFrame:
        """Discover timelines, load+cache raw events, run enhancers."""
        timelines = list(self.iter_timelines())
        store = self._store()
        sub = timelines
        if self.query is not None:
            summary = self.study_summary(apply_query=False)
            selected = summary.query(self.query)
            sub = [timelines[i] for i in selected.index]
        if not sub:
            raise RuntimeError(f"No timeline found for {self.study} ({self.query=})")

        # cache the enhanced result keyed by the query + enhancer config
        final_key = f"built-{self.query}"
        if store is not None and final_key in store:
            events = store[final_key]
            # restore timeline registry for method: URIs
            return validate_events(events)

        frames = [self._load_timeline(tl, store) for tl in sub]
        events = pd.concat(frames).reset_index(drop=True)
        enhancers = (
            list(self.enhancers.values())
            if isinstance(self.enhancers, dict)
            else list(self.enhancers)
        )
        for enhancer in enhancers:
            events = enhancer(events)
        events = validate_events(events)
        if store is not None:
            store[final_key] = events
        return events
