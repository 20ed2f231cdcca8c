"""COMPOSED-pipeline parity against the reference code itself.

The per-function oracles (test_reference_oracle.py) pin TimedArray,
splitting, segments, enhancer pieces.  This file runs the reference's
*whole host chain* — ``StudyLoader.build`` (studies/algonauts2025.py
timeline enumeration + TSV/h5/mkv readers) → enhancer chain →
``list_segments`` → ``SegmentDataset`` pooling — against the rebuild on
the same synthetic real-layout study, and requires identical event
DataFrames, segment windows, and per-batch pooled arrays
(/root/reference/data_utils/data_utils/data.py:180-231,
dataloader.py:123-180).

Reference modules are loaded by file path with stand-ins for dependencies
absent from this environment:
- ``exca`` MapInfra/CacheDict -> identity decorators (caching off; the
  cache layer is covered by our own cache tests, not this oracle)
- ``nibabel.Nifti2Image`` -> thin array holder (shape/get_fdata only)
- ``moviepy.VideoFileClip`` -> cv2-backed fps/duration probe
- ``nilearn.signal.clean`` -> faithful zscore_sample (ddof-1) replica;
  only used by the reference Fmri feature (neuro.py:119-131), so the
  pooling machinery around it is still genuinely cross-checked.
AddText (spacy) and ExtractAudioFromVideo (moviepy encode) stay out of
the chain on BOTH sides — their deps don't exist here.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF_DU = Path("/root/reference/data_utils/data_utils")

pytestmark = pytest.mark.skipif(not REF_DU.exists(), reason="reference not mounted")


def _install_stubs():
    if "exca" not in sys.modules or not hasattr(sys.modules["exca"], "__version__"):
        import pydantic

        exca = types.ModuleType("exca")
        exca.__version__ = "0.4.9"
        exca_utils = types.ModuleType("exca.utils")
        exca_utils.DISCRIMINATOR_FIELD = "name"
        exca.utils = exca_utils
        sys.modules["exca"] = exca
        sys.modules["exca.utils"] = exca_utils

    if "nibabel" not in sys.modules:
        nib = types.ModuleType("nibabel")

        class Nifti2Image:
            def __init__(self, dataobj, affine=None):
                self.dataobj = np.asarray(dataobj)
                self.affine = affine

            @property
            def shape(self):
                return self.dataobj.shape

            def get_fdata(self):
                return np.asarray(self.dataobj, np.float64)

        nib.Nifti2Image = Nifti2Image
        sys.modules["nibabel"] = nib

    if "moviepy" not in sys.modules:
        mv = types.ModuleType("moviepy")

        class VideoFileClip:
            def __init__(self, path):
                import cv2

                cap = cv2.VideoCapture(str(path))
                self.fps = cap.get(cv2.CAP_PROP_FPS) or 1.0
                frames = cap.get(cv2.CAP_PROP_FRAME_COUNT)
                self.duration = float(frames / self.fps)
                cap.release()

            def close(self):
                pass

        mv.VideoFileClip = VideoFileClip
        sys.modules["moviepy"] = mv

    if "spacy" not in sys.modules:
        # Sentence segmentation backed by OUR rule-based segmenter: the
        # boundaries themselves are pinned separately by
        # tests/test_sentence_segmentation.py's 55-case spacy fixture, so
        # this oracle checks everything composed AROUND segmentation
        # (matching, offsets, sentence assignment) without circularity on
        # the downstream logic.
        from algonauts2025_tpu.data import text_match as tm

        class _Tok:
            def __init__(self, text, idx, sent):
                self.text = text
                self.idx = idx
                self.sent = sent

            def __len__(self):
                return len(self.text)

        class _Sent:
            def __init__(self, text_with_ws, start):
                self.text_with_ws = text_with_ws
                self.start_char = start
                self.tokens: list = []

            def __iter__(self):
                return iter(self.tokens)

            def __getitem__(self, i):
                return self.tokens[i]

        class _Doc:
            def __init__(self, text):
                sents = {}
                order = []
                for t in tm.tokenize(text):
                    key = (t.sent.start, t.sent.end)
                    if key not in sents:
                        sents[key] = _Sent(t.sent.text, t.sent.start)
                        order.append(key)
                    s = sents[key]
                    s.tokens.append(_Tok(t.text, t.idx, s))
                self.sents = [sents[k] for k in order]

        spacy = types.ModuleType("spacy")
        spacy_util = types.ModuleType("spacy.util")
        spacy_util.is_package = lambda model: True
        spacy.util = spacy_util
        spacy.load = lambda model: _Doc
        sys.modules["spacy"] = spacy
        sys.modules["spacy.util"] = spacy_util

    if "nilearn" not in sys.modules:
        nil = types.ModuleType("nilearn")
        sig = types.ModuleType("nilearn.signal")

        def clean(signals, detrend=False, high_pass=None, t_r=None, standardize=None):
            assert standardize == "zscore_sample" and not detrend and high_pass is None
            m = signals.mean(axis=0, keepdims=True)
            s = signals.std(axis=0, ddof=1, keepdims=True)
            s = np.where(s == 0, 1.0, s)
            return (signals - m) / s

        sig.clean = clean
        nil.signal = sig
        sys.modules["nilearn"] = nil
        sys.modules["nilearn.signal"] = sig


def _stub_mapinfra():
    import pydantic

    class MapInfra(pydantic.BaseModel):
        model_config = pydantic.ConfigDict(extra="allow")
        cluster: str | None = None
        folder: str | None = None
        version: str = "1"
        mode: str = "cached"
        max_jobs: int | None = 128

        def apply(self, item_uid=None, exclude_from_cache_uid=(), cache_type=None):
            def deco(fn):
                return fn

            return deco

        def _update(self, values):
            for key, val in values.items():
                object.__setattr__(self, key, val)

    class CacheDict:
        def __init__(self, folder=None, cache_type=None):
            pass

    class TaskInfra(MapInfra):
        pass

    return MapInfra, CacheDict, TaskInfra


@pytest.fixture(scope="module")
def refx():
    _install_stubs()
    if "data_utils" in sys.modules and not hasattr(
        sys.modules["data_utils"], "__synthetic__"
    ):
        del sys.modules["data_utils"]
    pkg = sys.modules.get("data_utils")
    if pkg is None or getattr(pkg, "__fullchain__", False) is False:
        pkg = types.ModuleType("data_utils")
        pkg.__path__ = [str(REF_DU)]
        pkg.__synthetic__ = True
        pkg.__fullchain__ = True
        sys.modules["data_utils"] = pkg

    MapInfra, CacheDict, TaskInfra = _stub_mapinfra()
    infra_mod = types.ModuleType("data_utils.infra")
    infra_mod.MapInfra = MapInfra
    infra_mod.CacheDict = CacheDict
    infra_mod.TaskInfra = TaskInfra
    sys.modules["data_utils.infra"] = infra_mod
    pkg.infra = infra_mod

    def load(modname, relpath):
        spec = importlib.util.spec_from_file_location(
            f"data_utils.{modname}", REF_DU / relpath
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"data_utils.{modname}"] = mod
        spec.loader.exec_module(mod)
        parts = modname.split(".")
        parent = pkg
        for p in parts[:-1]:
            parent = getattr(parent, p)
        setattr(parent, parts[-1], mod)
        return mod

    loaded = {}
    for name in ("base", "utils", "events", "splitting", "segments", "helpers",
                 "enhancers", "download", "data"):
        loaded[name] = load(name, f"{name}.py")

    studies_pkg = types.ModuleType("data_utils.studies")
    studies_pkg.__path__ = [str(REF_DU / "studies")]
    sys.modules["data_utils.studies"] = studies_pkg
    pkg.studies = studies_pkg
    loaded["algonauts2025"] = load("studies.algonauts2025", "studies/algonauts2025.py")

    # synthetic features package: real neuro/subject, dummy classes for the
    # backbone features (dataloader's pad-length isinstance checks only)
    feats_pkg = types.ModuleType("data_utils.features")
    feats_pkg.__path__ = [str(REF_DU / "features")]
    sys.modules["data_utils.features"] = feats_pkg
    pkg.features = feats_pkg
    for sub, clsname in (("text", "LLAMA3p2"), ("audio", "Wav2VecBert"),
                         ("video", "VJEPA2")):
        m = types.ModuleType(f"data_utils.features.{sub}")
        setattr(m, clsname, type(clsname, (), {}))
        sys.modules[f"data_utils.features.{sub}"] = m
        setattr(feats_pkg, sub, m)
    loaded["neuro"] = load("features.neuro", "features/neuro.py")
    loaded["subject"] = load("features.subject", "features/subject.py")
    feats_pkg.SubjectEncoder = loaded["subject"].SubjectEncoder
    loaded["dataloader"] = load("dataloader", "dataloader.py")
    return types.SimpleNamespace(**loaded)


ENHANCERS = [
    {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.5},
    {"name": "AddContextToWords", "sentence_only": False, "max_context_len": 64},
    {"name": "RemoveMissing"},
]


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    from algonauts2025_tpu.data.synthetic import make_synthetic_study

    root = tmp_path_factory.mktemp("fullchain")
    # all four release subjects: the reference's _iter_timelines enumerates
    # them unconditionally and loads BOLD for every train timeline
    # (studies/algonauts2025.py:38,137-153)
    return make_synthetic_study(
        root,
        subjects=("sub-01", "sub-02", "sub-03", "sub-05"),
        with_video=True,
        duration=40.0,
    )


@pytest.fixture(scope="module")
def frames(refx, study):
    ref_loader = refx.data.StudyLoader(path=study, enhancers=list(ENHANCERS))
    theirs = ref_loader.build()

    from algonauts2025_tpu.data.study import StudyLoader

    ours = StudyLoader(path=study, enhancers=list(ENHANCERS)).build()
    return ours, theirs


def _norm(frame: pd.DataFrame) -> pd.DataFrame:
    out = frame.copy()
    out = out.sort_values(["timeline", "type", "start"], kind="stable")
    return out.reset_index(drop=True)


def test_fullchain_events_match(frames):
    ours, theirs = frames
    assert len(ours) == len(theirs)
    a, b = _norm(ours), _norm(theirs)
    # every column the reference produces must exist with equal content
    # (the rebuild may add none; extra__ passthroughs count)
    missing = set(b.columns) - set(a.columns)
    assert not missing, f"rebuild lacks reference columns: {missing}"
    for col in sorted(set(b.columns)):
        va, vb = a[col], b[col]
        if pd.api.types.is_float_dtype(vb):
            np.testing.assert_allclose(
                va.astype(float).to_numpy(),
                vb.astype(float).to_numpy(),
                atol=1e-9,
                err_msg=col,
            )
        else:
            sa = va.astype(str).where(~va.isna(), "#na#").tolist()
            sb = vb.astype(str).where(~vb.isna(), "#na#").tolist()
            assert sa == sb, f"column {col!r} diverges"


def test_fullchain_segments_match(frames, refx):
    ours_events, theirs_events = frames
    from algonauts2025_tpu.core.segments import list_segments

    for split in ("train", "test"):
        a = list_segments(ours_events[ours_events.split == split])
        b = refx.segments.list_segments(theirs_events[theirs_events.split == split])
        assert len(a) == len(b), split
        a = sorted(a, key=lambda s: (s.events.timeline.iloc[0], s.start))
        b = sorted(b, key=lambda s: (s.events.timeline.iloc[0], s.start))
        for sa, sb in zip(a, b):
            assert sa.start == pytest.approx(sb.start)
            assert sa.duration == pytest.approx(sb.duration)
            assert len(sa.events) == len(sb.events)


def test_fullchain_batch_pooling_matches(frames, refx):
    """fmri + subject_id pooled through both SegmentDatasets agree
    batch-for-batch (same segment order, pad_duration=149)."""
    ours_events, theirs_events = frames
    from algonauts2025_tpu.core.segments import list_segments
    from algonauts2025_tpu.data.dataset import SegmentDataset
    from algonauts2025_tpu.features.neuro import Fmri
    from algonauts2025_tpu.features.subject import SubjectEncoder

    ours_train = ours_events[ours_events.split == "train"]
    theirs_train = theirs_events[theirs_events.split == "train"]

    a_segs = sorted(
        list_segments(ours_train), key=lambda s: (s.events.timeline.iloc[0], s.start)
    )
    b_segs = sorted(
        refx.segments.list_segments(theirs_train),
        key=lambda s: (s.events.timeline.iloc[0], s.start),
    )

    # pad_duration=None on both sides: the reference's get_pad_lengths
    # reads Fmri.frequency, an attribute its Fmri class does not define
    # (dataloader.py:84 vs neuro.py — latent bug, production always runs
    # unpadded 149 s windows); all windows here are full-length anyway
    ours_fmri = Fmri()
    ours_subj = SubjectEncoder()
    ours_subj.prepare(ours_train)
    a_ds = SegmentDataset(
        {"fmri": ours_fmri, "subject_id": ours_subj}, a_segs, pad_duration=None
    )

    import torch

    theirs_fmri = refx.neuro.Fmri()
    theirs_subj = refx.subject.SubjectEncoder()
    # reference quirk: subject.py:95 does torch.zeros(*shape) with shape=()
    # for its 1-D output, which raises on current torch (zeros() needs a
    # size).  The default is never *used* when every segment has a subject
    # event, so pre-setting it keeps the oracle on the reference's main
    # path.
    theirs_subj._missing_default = torch.zeros((), dtype=torch.long)
    theirs_subj.prepare(refx.helpers.extract_events(theirs_train))
    b_ds = refx.dataloader.SegmentDataset(
        {"fmri": theirs_fmri, "subject_id": theirs_subj}, b_segs, pad_duration=None
    )

    a_batch = a_ds.as_one_batch()
    b_batch = b_ds.as_one_batch()
    for key in ("fmri", "subject_id"):
        va = np.asarray(a_batch.data[key])
        vb = b_batch.data[key].numpy()
        assert va.shape == vb.shape, key
        np.testing.assert_allclose(va, vb, atol=1e-5, err_msg=key)


FUZZ_CASES = [
    # (study kwargs, enhancer chain) — each case a different composition
    # of layouts and enhancer parameters through the SAME whole-chain
    # comparison as above
    (
        dict(subjects=("sub-01", "sub-02", "sub-03", "sub-05"), duration=25.0, n_parcels=16, with_video=True,
             seed=11, train_episodes=("e01a",), test_episodes=("e01a",)),
        [
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.7},
            {"name": "AddContextToWords", "sentence_only": True,
             "max_context_len": 16},
            {"name": "RemoveMissing"},
        ],
    ),
    (
        dict(subjects=("sub-01", "sub-02", "sub-03", "sub-05"), duration=55.0, n_parcels=32,
             with_video=True, seed=22, train_episodes=("e01a", "e01b", "e02a"),
             test_episodes=("e01a",)),
        [
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.7},
            {"name": "AssignSentenceSplit", "ratios": (0.7, 0.2, 0.1), "seed": 3,
             "min_duration": 4.0, "max_unmatched_ratio": 0.7},
            {"name": "ChunkEvents", "event_type_to_chunk": "Video",
             "event_type_to_use": "Word", "max_duration": 20.0},
            {"name": "RemoveMissing"},
        ],
    ),
    (
        dict(subjects=("sub-01", "sub-02", "sub-03", "sub-05"), duration=35.0, n_parcels=8,
             with_video=True, seed=33, train_episodes=("e01a", "e01b"),
             test_episodes=("e01a",)),
        [
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.7},
            {"name": "AssignSentenceSplit", "ratios": (0.5, 0.5, 0.0), "seed": 9,
             "min_words": 3, "max_unmatched_ratio": 0.7},
            {"name": "AddContextToWords", "sentence_only": False,
             "max_context_len": 128},
        ],
    ),
    (
        dict(subjects=("sub-01", "sub-02", "sub-03", "sub-05"), duration=30.0,
             n_parcels=8, with_video=True, seed=44, train_episodes=("e01a",),
             test_episodes=("e01a",)),
        [
            # override_sentences: re-annotate even pre-filled sentence cols
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.7,
             "override_sentences": True},
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.7,
             "override_sentences": True},  # idempotent second pass
            {"name": "AddContextToWords", "sentence_only": True,
             "max_context_len": 32},
            {"name": "RemoveMissing"},
        ],
    ),
]


@pytest.mark.parametrize("case", range(len(FUZZ_CASES)))
def test_fullchain_fuzzed_configs_match(refx, tmp_path_factory, case):
    """The composed chain agrees with the reference across varied study
    layouts and enhancer parameter combinations (splits, chunking, context
    caps) — not just the module-level fixture's single configuration."""
    study_kwargs, chain = FUZZ_CASES[case]
    from algonauts2025_tpu.data.synthetic import make_synthetic_study

    root = tmp_path_factory.mktemp(f"fuzz{case}")
    study = make_synthetic_study(root, **study_kwargs)

    theirs = refx.data.StudyLoader(path=study, enhancers=[dict(e) for e in chain]).build()
    from algonauts2025_tpu.data.study import StudyLoader

    ours = StudyLoader(path=study, enhancers=[dict(e) for e in chain]).build()
    assert len(ours) == len(theirs), "event row counts diverge"
    a, b = _norm(ours), _norm(theirs)
    # 'Index' is a reference chunk_events artifact (itertuples leak,
    # splitting.py:96-99) — an inert junk column deliberately not
    # reproduced (documented in core/splitting.py::chunk_events)
    b = b.drop(columns=["Index"], errors="ignore")
    missing = set(b.columns) - set(a.columns)
    assert not missing, f"rebuild lacks reference columns: {missing}"
    for col in sorted(set(b.columns)):
        va, vb = a[col], b[col]
        if pd.api.types.is_float_dtype(vb):
            np.testing.assert_allclose(
                va.astype(float).to_numpy(), vb.astype(float).to_numpy(),
                atol=1e-9, err_msg=col,
            )
        else:
            sa = va.astype(str).where(~va.isna(), "#na#").tolist()
            sb = vb.astype(str).where(~vb.isna(), "#na#").tolist()
            assert sa == sb, f"column {col!r} diverges"

    from algonauts2025_tpu.core.segments import list_segments

    for split in sorted(set(b.get("split", pd.Series(["train"])).dropna())):
        sa = list_segments(ours[ours.split == split])
        sb = refx.segments.list_segments(theirs[theirs.split == split])
        assert len(sa) == len(sb), split
        sa = sorted(sa, key=lambda s: (s.events.timeline.iloc[0], s.start))
        sb = sorted(sb, key=lambda s: (s.events.timeline.iloc[0], s.start))
        for x, y in zip(sa, sb):
            assert x.start == pytest.approx(y.start)
            assert x.duration == pytest.approx(y.duration)
            assert len(x.events) == len(y.events)
