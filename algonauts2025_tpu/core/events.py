"""Typed event taxonomy over stimulus timelines.

Rebuild of the reference event model (reference:
data_utils/data_utils/events.py:25-354): a pydantic ``Event`` hierarchy with
a subclass registry, DataFrame<->object round-trip, splittable media events
and a ``method:`` URI dispatch so fMRI payloads can be read through their
owning timeline object.

Host-side only.  Readers return NumPy arrays (never framework tensors); the
device boundary is crossed later by the feature extractors.
"""

from __future__ import annotations

import functools
import inspect
import logging
import typing as tp
import urllib.parse
from pathlib import Path

import numpy as np
import pandas as pd
import pydantic
from typing_extensions import Annotated

from .timed import Frequency

logger = logging.getLogger(__name__)

E = tp.TypeVar("E", bound="Event")

_ISSUED_WARNINGS: set[str] = set()


def warn_once(message: str) -> None:
    if message not in _ISSUED_WARNINGS:
        import warnings

        warnings.warn(message)
        _ISSUED_WARNINGS.add(message)


def _int_cast(v: tp.Any) -> tp.Any:
    if isinstance(v, int):
        return str(v)
    return v


StrCast = Annotated[str, pydantic.BeforeValidator(_int_cast)]


class Event(pydantic.BaseModel):
    """A typed span [start, start+duration) on a named timeline."""

    start: float
    timeline: str
    duration: pydantic.NonNegativeFloat = 0.0
    extra: dict[str, tp.Any] = {}

    type: tp.ClassVar[str] = "Event"
    _CLASSES: tp.ClassVar[dict[str, tp.Type["Event"]]] = {}
    _index: int | None = None

    def __init_subclass__(cls) -> None:
        super().__init_subclass__()
        cls.type = cls.__name__
        Event._CLASSES[cls.__name__] = cls

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if pd.isna(self.start):
            raise ValueError(f"Start time needs to be provided for {self!r}")

    @classmethod
    def from_dict(cls: tp.Type[E], row: tp.Any) -> E:
        """Build the right Event subclass from a dict / DataFrame row."""
        index: int | None = None
        if hasattr(row, "_asdict"):  # itertuples row
            index = getattr(row, "Index", None)
            row = row._asdict()
        cls_ = cls._CLASSES[row["type"]]
        if not issubclass(cls_, cls):
            raise TypeError(f"{cls_} is not a subclass of {cls}")
        fields = set(cls_.model_fields)
        kwargs: dict[str, tp.Any] = {}
        extra: dict[str, tp.Any] = {}
        for k, v in row.items():
            isna = pd.isna(v)
            if not np.ndim(isna) == 0:
                isna = False  # array-valued cell: keep
            if isna:
                continue
            if k in fields:
                kwargs[k] = v
            elif k != "type":
                if k.startswith("extra__"):
                    k = k[7:]
                extra[k] = v
        kwargs.setdefault("extra", {}).update(extra)
        try:
            out = cls_(**kwargs)
        except Exception as e:
            logger.warning("Event.from_dict failed for %s -> %s: %s", row, kwargs, e)
            raise
        out._index = index
        return out

    def to_dict(self) -> dict[str, tp.Any]:
        out = dict(self.extra)
        out["type"] = self.type
        fields = {
            x: str(y) if isinstance(y, Path) else y for x, y in self if x != "extra"
        }
        out.update(fields)
        return out

    @property
    def stop(self) -> float:
        return self.start + self.duration

    def __str__(self) -> str:
        core = {k: v for k, v in self if k != "extra"}
        return ", ".join(f"{k}={v}" for k, v in core.items())


Event._CLASSES["Event"] = Event


class EventTypesHelper:
    """Resolve a type spec (name(s) or class) to concrete Event subclasses."""

    def __init__(self, event_types: str | tp.Type[Event] | tp.Sequence[str]) -> None:
        self.specified = event_types
        if inspect.isclass(event_types):
            self.classes: tuple[tp.Type[Event], ...] = (event_types,)
        else:
            if isinstance(event_types, str):
                event_types = (event_types,)
            try:
                self.classes = tuple(Event._CLASSES[x] for x in event_types)
            except KeyError as e:
                avail = list(Event._CLASSES)
                raise ValueError(
                    f"{event_types} is an invalid event name, use one of {avail}"
                ) from e
        items = Event._CLASSES.items()
        self.names = [x for x, y in items if issubclass(y, self.classes)]


class BaseDataEvent(Event):
    """An event whose payload lives in a file (or behind a method: URI)."""

    filepath: Path | str = ""
    frequency: float = 0
    _read_method: tp.Any = None

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if not self.filepath:
            raise ValueError("A filepath must be provided")
        self._set_read_method()
        fp = str(self.filepath)
        self.filepath = fp
        if ":" not in fp and not Path(fp).exists():
            warn_once(f"file missing: {fp}")

    def _set_read_method(self) -> None:
        try:
            if getattr(self, "_read_method", None) is not None:
                return
        except TypeError:
            pass
        tag = "method:"
        fp = str(self.filepath)
        if not fp.startswith(tag):
            self._read_method = self._read
            return
        # "method:<name>?k=v" dispatches to a method of the owning timeline
        # object (reference events.py:156-171).
        from ..data.study import TIMELINES

        components = urllib.parse.urlparse(fp)
        assert components.netloc == ""
        assert components.params == ""
        assert components.fragment == ""
        inst = TIMELINES[self.timeline]
        kwargs = dict(urllib.parse.parse_qsl(components.query, strict_parsing=True))
        self._read_method = functools.partial(getattr(inst, components.path), **kwargs)

    def __hash__(self) -> int:
        return hash(str(sorted((k, str(v)) for k, v in self.to_dict().items())))

    def __eq__(self, other: tp.Any) -> bool:
        if isinstance(other, self.__class__):
            return self.__hash__() == other.__hash__()
        return False

    def read(self) -> tp.Any:
        self._set_read_method()
        return self._read_method()

    def _read(self) -> tp.Any:
        raise NotImplementedError

    def _missing_duration_or_frequency(self) -> bool:
        return any(not x or pd.isna(x) for x in [self.duration, self.frequency])


class BaseSplittableEvent(BaseDataEvent):
    """A data event that can be split at timepoints (chunking support)."""

    offset: pydantic.NonNegativeFloat = 0.0

    def _split(
        self, timepoints: tp.List[float], min_duration: float | None = None
    ) -> tp.Sequence["BaseSplittableEvent"]:
        timepoints = [t for t in timepoints if 0 < t < self.duration]
        timepoints = sorted(set(timepoints))
        if min_duration:
            delta_before = np.diff(timepoints, prepend=0)
            delta_after = np.diff(timepoints, append=self.duration)
            timepoints = [
                t
                for t, db, da in zip(timepoints, delta_before, delta_after)
                if db >= min_duration and da >= min_duration
            ]
        timepoints.append(self.duration)
        start = 0.0
        data = dict(self)
        cls = self.__class__
        out = []
        for stop in list(timepoints):
            if start >= stop:
                raise ValueError(
                    f"Timepoints should be strictly increasing (got {start}, {stop})"
                )
            data.update(
                start=self.start + start,
                duration=stop - start,
                offset=self.offset + start,
            )
            out.append(cls(**data))
            start = stop
        return out


class Image(BaseDataEvent):
    caption: str = ""

    def _read(self) -> tp.Any:
        import PIL.Image

        return PIL.Image.open(self.filepath).convert("RGB")

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if self.duration <= 0:
            logger.info("Image event has null duration and will be ignored.")


class Sound(BaseSplittableEvent):
    """A span of an audio file.  ``read()`` -> float32 (samples, channels)."""

    def model_post_init(self, _ctx: tp.Any) -> None:
        if not Path(str(self.filepath)).exists():
            raise ValueError(f"Sound filepath does not exist: {self.filepath}")
        if self._missing_duration_or_frequency():
            from ..io import wav as wavio

            info = wavio.info(str(self.filepath))
            self.frequency = float(info.samplerate)
            self.duration = info.duration
        super().model_post_init(_ctx)

    def _read(self) -> np.ndarray:
        from ..io import wav as wavio

        sr = Frequency(self.frequency)
        offset = sr.to_ind(self.offset)
        num = sr.to_ind(self.duration)
        out = wavio.read(str(self.filepath), start=offset, frames=num)
        if out.ndim == 1:
            out = out[:, None]
        return out


class Video(BaseSplittableEvent):
    """A span of a video file.  ``read()`` -> io.video.VideoReader clip."""

    def model_post_init(self, _ctx: tp.Any) -> None:
        if not Path(str(self.filepath)).exists():
            raise ValueError(f"Missing video file {self.filepath}")
        if self._missing_duration_or_frequency():
            from ..io import video as videoio

            info = videoio.info(str(self.filepath))
            self.frequency = float(info.fps)
            self.duration = info.duration
        super().model_post_init(_ctx)

    def _read(self) -> tp.Any:
        from ..io import video as videoio

        return videoio.VideoClip(
            str(self.filepath), offset=self.offset, duration=self.duration
        )


class BaseText(Event):
    language: str = ""
    text: str = pydantic.Field("", min_length=1)
    context: str = ""


class Text(BaseText):
    pass


class Sentence(BaseText):
    pass


class Word(BaseText):
    sentence: str = ""
    sentence_char: int | None = None


class Phoneme(BaseText):
    pass


class Fmri(BaseDataEvent):
    """BOLD recording: (parcels, time) at ``frequency`` Hz (TR = 1/freq)."""

    subject: StrCast = ""

    def model_post_init(self, _ctx: tp.Any) -> None:
        self.subject = str(self.subject)
        if self._missing_duration_or_frequency():
            raise ValueError(
                "Duration and frequency must be provided for Fmri event; "
                f"got: {self}"
            )
        if not self.subject:
            raise ValueError("Missing 'subject' field")
        super().model_post_init(_ctx)

    def _read(self) -> np.ndarray:
        from ..io import fmri as fmriio

        return fmriio.load(str(self.filepath))
