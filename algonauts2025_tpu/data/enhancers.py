"""Config-driven event-DataFrame transforms (enhancer pipeline).

Rebuild of reference data_utils/data_utils/enhancers.py: a discriminated
union of pydantic transforms applied in sequence by the StudyLoader.  All
host-side preprocessing; results are cached upstream by the study cache.
"""

from __future__ import annotations

import logging
import typing as tp
from pathlib import Path

import numpy as np
import pandas as pd
import pydantic

from ..core import events as ev
from ..core import splitting
from ..core.segments import find_enclosed
from ..core.splitting import chunk_events
from . import text_match

logger = logging.getLogger(__name__)

MISSING_SENTENCE = "# MISSING SENTENCE #"


class BaseEnhancer(pydantic.BaseModel):
    """Registry base: subclasses declare ``name: tp.Literal['X'] = 'X'``."""

    model_config = pydantic.ConfigDict(extra="forbid")
    name: str

    _CLASSES: tp.ClassVar[dict[str, type["BaseEnhancer"]]] = {}
    _discriminating_type_adapter: tp.ClassVar[pydantic.TypeAdapter]

    @classmethod
    def __pydantic_init_subclass__(cls, **kwargs: tp.Any) -> None:
        super().__pydantic_init_subclass__(**kwargs)
        name = cls.__name__
        if "Base" not in name and not name.startswith("_"):
            if "name" not in cls.model_fields or cls.model_fields["name"].default != name:
                raise NotImplementedError(
                    f"Enhancer {name} needs: name: tp.Literal[{name!r}] = {name!r}"
                )
            BaseEnhancer._CLASSES[name] = cls
            BaseEnhancer._discriminating_type_adapter = pydantic.TypeAdapter(
                tp.Annotated[
                    tp.Union[tuple(cls._CLASSES.values())],
                    pydantic.Field(discriminator="name"),
                ]
            )

    @pydantic.model_validator(mode="wrap")
    @classmethod
    def _parse_into_subclass(
        cls, v: tp.Any, handler: pydantic.ValidatorFunctionWrapHandler
    ) -> "BaseEnhancer":
        if cls is BaseEnhancer:
            return BaseEnhancer._discriminating_type_adapter.validate_python(v)
        return handler(v)

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError


Enhancer = BaseEnhancer
EnhancerConfig = BaseEnhancer


class AddText(BaseEnhancer):
    """Concatenate Word events into one re-punctuated Text per timeline."""

    name: tp.Literal["AddText"] = "AddText"

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        if "Text" in events.type.unique():
            logger.info("Text already present in events dataframe, skipping")
            return events
        text_events = []
        for _, df in events.groupby("timeline"):
            words = df.loc[df.type == "Word"].copy()
            if words.empty:
                continue
            words["stop"] = words["start"] + words["duration"]
            text = " ".join(words.text.values)
            sents = text_match.split_sentences(text)
            sentences = [s.text.strip().capitalize().rstrip(".") for s in sents]
            punctuated = ". ".join(sentences)
            text_event = words.iloc[0].to_dict()
            text_event |= dict(
                type="Text",
                start=words.start.min(),
                duration=words.stop.max() - words.start.min(),
                timeline=df.timeline.values[0],
                text=punctuated,
            )
            text_events.append(text_event)
        return pd.concat([events, pd.DataFrame(text_events)], ignore_index=True)


class AddSentenceToWords(BaseEnhancer):
    """Fuzzy-align Words to the Text transcript; annotate sentence spans."""

    name: tp.Literal["AddSentenceToWords"] = "AddSentenceToWords"
    max_unmatched_ratio: float = 0.0
    override_sentences: bool = False

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if self.max_unmatched_ratio < 0 or self.max_unmatched_ratio >= 1:
            raise ValueError("max_unmatched_ratio must be >=0 and <1")

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        if "Sentence" in events.type.unique():
            if not self.override_sentences:
                logger.warning("Sentence already present in events dataframe")
                return events
            events = events[events.type != "Sentence"]
        if "timeline" in events.columns and len(events.timeline.unique()) > 1:
            out = [
                self(sub) for _, sub in events.groupby("timeline", sort=False)
            ]
            return pd.concat(out, ignore_index=True)

        contexts = events.loc[events.type == "Text"]
        events = events.copy(deep=True)
        wtypes = ev.EventTypesHelper("Word")
        words = events[events.type.isin(wtypes.names)]
        events.loc[:, "sentence_char"] = np.nan
        events["sentence"] = ""
        events["sentence"] = events["sentence"].astype(object)

        sentences: list[dict] = []
        for context in contexts.itertuples():
            encl = find_enclosed(events, start=context.start, duration=context.duration)
            sub = events.loc[encl]
            sel = sub[sub.type.isin(wtypes.names)].index
            if not len(sel):
                raise ValueError("No word overlapping with context")
            wordseq = words.loc[sel].text.tolist()
            lang = getattr(context, "language", None)
            if not isinstance(lang, str):
                raise ValueError(f"Need language for Text field {context}")
            info = pd.DataFrame(
                text_match.match_text_words(context.text, wordseq, language=lang),
                index=sel,
            )
            events.loc[sel, info.columns] = info
            context_sentences = [s.to_dict() for s in _extract_sentences(events)]
            subject = getattr(context, "subject", None)
            if subject is not None:
                for s in context_sentences:
                    s["subject"] = subject
            sentences.extend(context_sentences)
        sentence_df = pd.DataFrame(
            [s for s in sentences if s["text"] != MISSING_SENTENCE]
        )
        events = pd.concat([events, sentence_df], ignore_index=True)
        events = events.reset_index(drop=True)

        words = events[events.type.isin(wtypes.names)]
        if len(words) == 0:
            return events
        ratio = sum(
            not s or not isinstance(s, str) for s in words.sentence
        ) / len(words)
        if ratio > self.max_unmatched_ratio:
            raise RuntimeError(
                f"Ratio of unmatched words is {ratio:.4f} on {len(words)} words "
                f"while max_unmatched_ratio={self.max_unmatched_ratio}"
            )
        return events


def _extract_sentences(events: pd.DataFrame) -> tp.List[ev.Sentence]:
    """Group annotated words into Sentence events (reference enhancers.py:205-245)."""
    wtypes = ev.EventTypesHelper("Word")
    words_df = events.loc[events.type.isin(wtypes.names), :]
    sentences: list[ev.Sentence] = []
    words: tp.List[tp.Any] = []
    eps = 1e-6
    for k, word in enumerate(words_df.itertuples(index=False)):
        if words and words[-1].timeline == word.timeline:
            if word.start < words[-1].start:
                raise ValueError("Words are not sorted within a timeline")
        sentence_end = False
        if k == len(words_df) - 1:
            sentence_end = True
            words.append(word)
        if words:
            sentence_end |= words[-1].timeline != word.timeline
            sentence_end |= word.sentence != words[-1].sentence
            wc, lc = word.sentence_char, words[-1].sentence_char
            if not (pd.isna(wc) or pd.isna(lc)):
                sentence_end |= wc <= lc
            if sentence_end:
                w0 = words[0]
                text = w0.sentence
                if not (isinstance(text, str) and text):
                    text = MISSING_SENTENCE
                sentences.append(
                    ev.Sentence(
                        start=w0.start - eps,
                        duration=words[-1].start + words[-1].duration - w0.start + 2 * eps,
                        timeline=w0.timeline,
                        text=text,
                    )
                )
                words = []
        words.append(word)
    return sentences


class AssignSentenceSplit(BaseEnhancer):
    """Deterministically split sentence groups into train/val/test."""

    name: tp.Literal["AssignSentenceSplit"] = "AssignSentenceSplit"
    min_duration: float | None = None
    min_words: int | None = None
    ratios: tp.Tuple[float, float, float] = (0.8, 0.1, 0.1)
    seed: int = 0
    max_unmatched_ratio: float = 0.0

    def model_post_init(self, _ctx: tp.Any) -> None:
        super().model_post_init(_ctx)
        if not sum(self.ratios) == 1:
            raise ValueError("Split ratios must sum to 1")

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        dropped_timeline = False
        if "timeline" not in events.columns:
            events["timeline"] = "#foo#"
            dropped_timeline = True
        wtypes = ev.EventTypesHelper("Word")
        words_df = events.loc[events.type.isin(wtypes.names), :]
        ratio = sum(
            not s or not isinstance(s, str) for s in words_df.sentence
        ) / len(words_df)
        if ratio > self.max_unmatched_ratio:
            raise RuntimeError(
                f"Ratio of words with no sentence match is {ratio:.2f} "
                f"while max_unmatched_ratio={self.max_unmatched_ratio}"
            )
        sentences = _extract_sentences(events)
        merged = _merge_sentences(
            sentences, min_duration=self.min_duration, min_words=self.min_words
        )
        ratios = dict(train=self.ratios[0], val=self.ratios[1], test=self.ratios[2])
        ratios = {x: y for x, y in ratios.items() if y > 0}
        if len(ratios) == 1:
            events.loc[events.type.isin(wtypes.names), "split"] = list(ratios)[0]
            if dropped_timeline:
                events = events.drop("timeline", axis=1)
            return events
        splitter = splitting.DeterministicSplitter(ratios, seed=self.seed)
        undef = "undefined"
        affectations: tp.Dict[tp.Any, tp.Any] = {MISSING_SENTENCE: undef}
        groups: tp.Dict[str, tp.Set[str]] = {}
        for part in merged:
            string = "".join(s.text for s in part)
            if string not in affectations:
                affectations[string] = splitter(string)
            split = affectations[string]
            for seq in part:
                groups.setdefault(seq.text, set()).add(string)
                if affectations.setdefault(seq.text, split) != split:
                    affectations[seq.text] = undef
                    logger.warning(
                        "Sequence split %r set to undefined (conflicting groups: %s)",
                        seq.text,
                        groups[seq.text],
                    )
        valid = ~(np.logical_or(events.sentence.isnull(), events.sentence == ""))
        events.loc[valid, "split"] = (
            events.loc[valid].sentence.apply(str).apply(lambda x: affectations[x])
        )
        events.loc[
            np.logical_and(~valid, events.type.isin(wtypes.names)), "split"
        ] = undef
        if dropped_timeline and tuple(events.timeline.unique()) == ("#foo#",):
            events = events.drop("timeline", axis=1)
        return events


class AddContextToWords(BaseEnhancer):
    """Rolling left context for each word (caps at max_context_len words)."""

    name: tp.Literal["AddContextToWords"] = "AddContextToWords"
    sentence_only: bool = True
    max_context_len: int | None = None
    split_field: str = "split"

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        if hasattr(events, "context"):
            events.context = events.context.fillna("").astype(str)
        wtypes = ev.EventTypesHelper("Word")
        words = events.loc[events.type.isin(wtypes.names), :]
        past_sentences: tp.List[str] = []
        last_word: tp.Any = None
        contexts: list[str] = []
        sfield = self.split_field
        if sfield and sfield not in words.columns:
            raise ValueError(f"split_field {sfield!r} is not part of dataframe columns")
        for word in words.itertuples(index=False):
            sent = word.sentence
            if not (isinstance(sent, str) and sent):
                if sfield and last_word is not None:
                    if getattr(last_word, sfield, "") != getattr(word, sfield, ""):
                        past_sentences = []
                contexts.append("")
                last_word = None
                continue
            if last_word is not None:
                if word.sentence != last_word.sentence:
                    wc, lc = word.sentence_char, last_word.sentence_char
                    if not (pd.isna(wc) or pd.isna(lc)) and wc <= lc:
                        if not self.sentence_only:
                            past_sentences.append(last_word.sentence)
                        if sfield:
                            if getattr(last_word, sfield, "") != getattr(word, sfield, ""):
                                past_sentences = []
                if last_word.timeline != word.timeline:
                    past_sentences = []
                elif word.start < last_word.start:
                    raise ValueError(
                        f"Words are not in increasing order ({word} after {last_word})"
                    )
            if word.sentence_char is None or np.isnan(word.sentence_char):
                contexts.append("")
                continue
            last_word = word
            last_char = float(word.sentence_char) + len(word.text)
            context = "".join(past_sentences) + word.sentence[: int(last_char)]
            if self.max_context_len is not None:
                context = " ".join(context.split(" ")[-self.max_context_len - 1 :])
            contexts.append(context)
        events.loc[events.type.isin(wtypes.names), "context"] = contexts
        return events


class RemoveMissing(BaseEnhancer):
    """Drop events whose ``field`` is null/empty."""

    name: tp.Literal["RemoveMissing"] = "RemoveMissing"
    event_types: str | tp.Sequence[str] = "Word"
    field: str = "context"

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        if self.field not in events.columns:
            logger.warning("Field %s not in events dataframe, skipping", self.field)
            return events
        names = ev.EventTypesHelper(self.event_types).names
        data = events.loc[:, self.field]
        missing = np.logical_or(data.isnull(), data == "")
        return events.loc[np.logical_or(~events.type.isin(names), ~missing)]


class ChunkEvents(BaseEnhancer):
    name: tp.Literal["ChunkEvents"] = "ChunkEvents"
    event_type_to_chunk: tp.Literal["Sound", "Video"]
    event_type_to_use: str | None = None
    min_duration: float | None = None
    max_duration: float = np.inf

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        return chunk_events(
            events,
            self.event_type_to_chunk,
            self.event_type_to_use,
            self.min_duration,
            self.max_duration,
        )


class ExtractAudioFromVideo(BaseEnhancer):
    """Create Sound events for each Video's audio track.

    If a ``.wav`` sibling of the video already exists it is used directly;
    otherwise the audio is demuxed via the ffmpeg binary when available.
    (The reference used moviepy for the same job, enhancers.py:430-459.)
    """

    name: tp.Literal["ExtractAudioFromVideo"] = "ExtractAudioFromVideo"

    def __call__(self, events: pd.DataFrame) -> pd.DataFrame:
        video_events = events.loc[events.type == "Video"]
        if len(video_events) == 0:
            return events
        events_to_add = []
        for video_event in video_events.itertuples():
            audio_filepath = Path(video_event.filepath).with_suffix(".wav")
            if not audio_filepath.exists():
                if not _demux_audio(Path(video_event.filepath), audio_filepath):
                    logger.warning(
                        "No audio available for %s (no .wav sibling, no ffmpeg)",
                        video_event.filepath,
                    )
                    continue
            audio_event = video_event._asdict()
            audio_event.pop("Index", None)
            audio_event.update(
                type="Sound", filepath=str(audio_filepath), frequency=pd.NA
            )
            events_to_add.append(audio_event)
        events = pd.concat([events, pd.DataFrame(events_to_add)], ignore_index=True)
        return events.reset_index(drop=True)


def _demux_audio(video_path: Path, wav_path: Path) -> bool:
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        return False
    try:
        subprocess.run(
            [ffmpeg, "-y", "-i", str(video_path), "-vn", "-acodec", "pcm_s16le",
             str(wav_path)],
            check=True,
            capture_output=True,
        )
        return wav_path.exists()
    except subprocess.CalledProcessError:
        return False


def _merge_sentences(
    sentences: tp.List[ev.Sentence],
    min_duration: float | None = None,
    min_words: int | None = None,
) -> tp.List[tp.List[ev.Sentence]]:
    out: tp.List[tp.List[ev.Sentence]] = []
    for s in sentences:
        new = True
        if out:
            if min_duration is not None:
                new &= s.start - out[-1][0].start >= min_duration
            if min_words is not None:
                new &= sum(len(x.text.split()) for x in out[-1]) >= min_words
        if not new:
            new |= out[-1][-1].timeline != s.timeline
        if new:
            out.append([s])
        else:
            out[-1].append(s)
    return out


class AddTextToWords(AddText):
    """Alias of AddText kept for config compatibility (reference
    enhancers.py:115-116)."""

    name: tp.Literal["AddTextToWords"] = "AddTextToWords"
