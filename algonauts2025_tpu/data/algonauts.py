"""Algonauts 2025 dataset adapter.

Rebuild of reference data_utils/data_utils/studies/algonauts2025.py:
enumerates Friends s1-s7 (a-d chunks) + movie10 timelines for
sub-01/02/03/05, reads TSV transcripts into Word events, the .mkv movie
into a Video event and the per-subject HDF5 BOLD into an Fmri event
(TR 1.49 s, Schaefer-1000).  Friends season 7 is the held-out test split.

Differences from the reference (deliberate):
- fMRI payloads are plain (parcels, time) float32 arrays (no nibabel).
- The Video event is only added when the movie file exists, so text/audio
  pipelines run on partial mirrors of the dataset.
"""

from __future__ import annotations

import typing as tp
from itertools import product
from pathlib import Path

import numpy as np
import pandas as pd

from .study import BaseData

TR_SECONDS = 1.49

#: timelines excluded upstream (missing/corrupt in the release)
_EXCLUDED_FRIENDS = {
    (5, 20, "a"),
    (4, 1, "a"),
    (6, 3, "a"),
    (4, 13, "b"),
    (4, 1, "b"),
}


class Algonauts2025(BaseData):
    task: tp.Literal["friends", "movie10"]
    movie: str
    chunk: str
    run: int = 0

    version: tp.ClassVar[str] = "v1"

    @classmethod
    def _iter_timelines(cls, path: str | Path) -> tp.Iterator["Algonauts2025"]:
        for subject in ["sub-01", "sub-02", "sub-03", "sub-05"]:
            for task in ["friends", "movie10"]:
                if task == "friends":
                    for season, episode, chunk in product(
                        range(1, 8), range(1, 26), "abcd"
                    ):
                        if (season, episode, chunk) in _EXCLUDED_FRIENDS:
                            continue
                        timeline = cls(
                            path=str(path),
                            subject=subject,
                            task=task,
                            movie=str(season),
                            chunk=f"e{episode:02d}{chunk}",
                        )
                        if timeline._get_transcript_filepath().exists() and (
                            timeline._get_split() == "test"
                            or timeline._get_fmri_filepath().exists()
                        ):
                            yield timeline
                else:
                    for movie, chunk, run in product(
                        ["bourne", "wolf", "life", "figures"], range(1, 18), [1, 2]
                    ):
                        if movie in ["bourne", "wolf"] and run == 2:
                            continue
                        timeline = cls(
                            path=str(path),
                            subject=subject,
                            task=task,
                            movie=movie,
                            chunk=str(chunk),
                            run=run,
                        )
                        if (
                            timeline._get_transcript_filepath().exists()
                            and timeline._get_fmri_filepath().exists()
                        ):
                            yield timeline

    # -- on-disk layout ---------------------------------------------------
    def _root(self) -> Path:
        return Path(self.path) / "download" / "algonauts_2025.competitors"

    def _get_transcript_filepath(self) -> Path:
        folder = self._root() / "stimuli" / "transcripts" / self.task
        if self.task == "friends":
            return folder / f"s{self.movie}" / f"friends_s{int(self.movie):02d}{self.chunk}.tsv"
        return folder / self.movie / f"movie10_{self.movie}{int(self.chunk):02d}.tsv"

    def _get_movie_filepath(self) -> Path:
        folder = self._root() / "stimuli" / "movies" / self.task
        if self.task == "friends":
            return folder / f"s{self.movie}" / f"friends_s{int(self.movie):02d}{self.chunk}.mkv"
        return folder / self.movie / f"{self.movie}{int(self.chunk):02d}.mkv"

    def _get_fmri_filepath(self) -> Path:
        subj_dir = self._root() / "fmri" / self.subject / "func"
        stem = (
            f"{self.subject}_task-{self.task}_space-MNI152NLin2009cAsym_"
            "atlas-Schaefer18_parcel-1000Par7Net"
        )
        if self.task == "friends":
            return subj_dir / f"{stem}_desc-s123456_bold.h5"
        return subj_dir / f"{stem}_bold.h5"

    # -- payload loading --------------------------------------------------
    def _fmri_key(self) -> str:
        if self.task == "friends":
            return f"{int(self.movie):02d}{self.chunk}"
        key = f"{self.movie}{int(self.chunk):02d}"
        if self.movie in ["life", "figures"]:
            key += f"_run-{self.run}"
        return key

    def _load_fmri(self, timeline: str = "") -> np.ndarray:
        """(parcels, time) float32 BOLD for this timeline's chunk."""
        from ..io.fmri import load_h5_key

        data = load_h5_key(str(self._get_fmri_filepath()), self._fmri_key())
        # release stores (time, parcels); keep time last
        return np.ascontiguousarray(data.T)

    def _get_split(self) -> str:
        if self.task == "friends":
            return "test" if int(self.movie) == 7 else "train"
        return "train"

    def _load_events(self) -> pd.DataFrame:
        all_events: list[dict] = []
        if not (self.task == "friends" and self.movie == "7"):
            uri = f"method:_load_fmri?timeline={self.timeline}"
            fmri = self._load_fmri()
            fmri_duration = fmri.shape[-1] * TR_SECONDS
            all_events.append(
                dict(
                    type="Fmri",
                    filepath=uri,
                    start=0,
                    frequency=1 / TR_SECONDS,
                    duration=fmri_duration,
                )
            )

        movie_filepath = self._get_movie_filepath()
        if movie_filepath.exists():
            all_events.append(dict(type="Video", filepath=movie_filepath, start=0))

        transcript_df = pd.read_csv(self._get_transcript_filepath(), sep="\t")
        word_events: list[dict] = []
        for _, row in transcript_df.iterrows():
            words = eval(row["words_per_tr"])  # noqa: S307 (dataset format)
            starts = eval(row["onsets_per_tr"])  # noqa: S307
            durations = eval(row["durations_per_tr"])  # noqa: S307
            for word, start, duration in zip(words, starts, durations):
                word_events.append(
                    dict(
                        type="Word",
                        text=word,
                        start=start,
                        duration=duration,
                        stop=start + duration,
                        language="english",
                    )
                )
        if word_events:
            word_df = pd.DataFrame(word_events)
            text = " ".join(word_df["text"].tolist())
            all_events.append(
                dict(
                    type="Text",
                    text=text,
                    start=word_df["start"].min(),
                    duration=word_df["stop"].max() - word_df["start"].min(),
                    stop=word_df["stop"].max(),
                    language="english",
                )
            )
        all_events.extend(word_events)

        events_df = pd.DataFrame(all_events)
        events_df["split"] = self._get_split()
        events_df["movie"] = "movie:" + str(self.movie)
        events_df["chunk"] = "chunk:" + str(self.chunk)
        return events_df
