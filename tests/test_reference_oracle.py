"""Behavioral parity of the rewritten host layer against the REFERENCE CODE
ITSELF, loaded module-by-module as an oracle.

The round-2 rewrites re-derived core/timed, core/splitting, core/segments,
core/events and data/helpers from behavioral specs.  These tests feed
randomized inputs through both stacks and require identical outputs — the
strongest provenance-independent evidence that behavior survived the
rewrite.  Skipped when the reference tree is not mounted.

The reference package __init__ imports exca (absent here), so modules are
loaded directly by file path under a synthetic ``data_utils`` package.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference/data_utils/data_utils")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref():
    """The reference data_utils modules, loaded without its __init__."""
    if "data_utils" in sys.modules and not hasattr(sys.modules["data_utils"], "__synthetic__"):
        del sys.modules["data_utils"]
    if "exca" not in sys.modules:
        # the enhancers module only needs the discriminator constant
        exca = types.ModuleType("exca")
        exca_utils = types.ModuleType("exca.utils")
        exca_utils.DISCRIMINATOR_FIELD = "name"
        exca.utils = exca_utils
        sys.modules["exca"] = exca
        sys.modules["exca.utils"] = exca_utils
    pkg = types.ModuleType("data_utils")
    pkg.__path__ = [str(REF)]
    pkg.__synthetic__ = True
    sys.modules["data_utils"] = pkg
    loaded = {}
    for name in ("base", "utils", "events", "splitting", "segments", "helpers",
                 "enhancers"):
        spec = importlib.util.spec_from_file_location(
            f"data_utils.{name}", REF / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"data_utils.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
        loaded[name] = mod
    return types.SimpleNamespace(**loaded)


def test_timed_array_matches_reference(ref):
    """Random overlap-add programs produce identical arrays."""
    from algonauts2025_tpu.core.timed import TimedArray

    rng = np.random.default_rng(0)
    for trial in range(200):
        freq = float(rng.choice([1.0, 2.0, 16.0, 1 / 1.49]))
        start = float(rng.uniform(-5, 5))
        duration = float(rng.uniform(0.5, 30))
        agg = str(rng.choice(["sum", "average"]))
        ours = TimedArray(
            frequency=freq, start=start, duration=duration, aggregation=agg
        )
        theirs = ref.base.TimedArray(
            frequency=freq, start=start, duration=duration, aggregation=agg
        )
        for _ in range(int(rng.integers(1, 6))):
            static = rng.random() < 0.3
            o_start = float(rng.uniform(start - 3, start + duration + 3))
            o_dur = float(rng.uniform(0.0, 10))
            if static:
                payload = rng.standard_normal(5)
                piece = dict(frequency=0.0, start=o_start, duration=o_dur, data=payload)
            else:
                width = max(1, int(round(o_dur * freq)))
                payload = rng.standard_normal((5, width))
                piece = dict(frequency=freq, start=o_start, data=payload)
            ours += TimedArray(**piece)
            theirs += ref.base.TimedArray(**piece)
        assert ours.duration == pytest.approx(theirs.duration)
        np.testing.assert_allclose(ours.data, theirs.data, atol=1e-10, err_msg=str(trial))

        # overlap extraction agrees (including None cases)
        q_start = float(rng.uniform(start - 3, start + duration + 3))
        q_dur = float(rng.uniform(0, 8))
        a = ours.overlap(q_start, q_dur)
        b = theirs.overlap(q_start, q_dur)
        assert (a is None) == (b is None)
        if a is not None:
            assert a.start == pytest.approx(b.start)
            # the streaming mean uses the incremental form x += (v-x)/(n+1)
            # (same value as the reference's two-term form up to 1 ulp)
            np.testing.assert_allclose(a.data, b.data, atol=1e-12)


def test_splitter_matches_reference(ref):
    from algonauts2025_tpu.core.splitting import DeterministicSplitter

    rng = np.random.default_rng(1)
    for ratios in ({"train": 0.9, "val": 0.1}, {"a": 0.5, "b": 0.3, "c": 0.2}):
        for seed in (0, 1, 17):
            ours = DeterministicSplitter(ratios, seed=seed)
            theirs = ref.splitting.DeterministicSplitter(dict(ratios), seed=seed)
            for _ in range(300):
                uid = "".join(rng.choice(list("abcdefgh123"), 12))
                assert ours(uid) == theirs(uid)


def _event_frame(tmp_path, n_words: int, total: float) -> pd.DataFrame:
    from algonauts2025_tpu.io import wav as wavio

    fp = tmp_path / "oracle.wav"
    if not fp.exists():
        wavio.write(fp, np.zeros(int(16000 * total), np.float32), 16000)
    rng = np.random.default_rng(3)
    rows = [
        dict(type="Sound", filepath=str(fp), start=0.0, duration=total,
             frequency=16000.0, offset=0.0, timeline="tl")
    ]
    t = 0.3
    for k in range(n_words):
        rows.append(
            dict(type="Word", text=f"w{k}", start=round(t, 3), duration=0.25,
                 timeline="tl", language="english")
        )
        t += float(rng.uniform(0.3, 1.2))
    frame = pd.DataFrame(rows)
    frame["stop"] = frame.start + frame.duration  # as validate_events adds
    return frame


def test_chunk_events_matches_reference(ref, tmp_path):
    from algonauts2025_tpu.core.splitting import chunk_events

    frame = _event_frame(tmp_path, n_words=30, total=25.0)
    ours = chunk_events(frame.copy(), "Sound", max_duration=6.0, min_duration=2.0)
    theirs = ref.splitting.chunk_events(
        frame.copy(), "Sound", max_duration=6.0, min_duration=2.0
    )
    ours_s = ours[ours.type == "Sound"].sort_values("start")
    theirs_s = theirs[theirs.type == "Sound"].sort_values("start")
    for col in ("start", "duration", "offset"):
        np.testing.assert_allclose(
            ours_s[col].astype(float).to_numpy(),
            theirs_s[col].astype(float).to_numpy(),
        )
    # the only column the rewrite drops is the reference's stray itertuples
    # "Index"; everything else matches
    assert set(theirs.columns) - set(ours.columns) <= {"Index"}


def _annotated_words(seed: int = 7, unmatched: float = 0.1) -> pd.DataFrame:
    """Word rows as AddSentenceToWords would leave them: sentence text +
    char offsets, occasional unmatched words, alternating split labels."""
    rng = np.random.default_rng(seed)
    vocab = "the cat sat on a mat while dogs ran far away again".split()
    rows = []
    t = 0.0
    for tl in ("t1", "t2"):
        for si in range(6):
            n = int(rng.integers(2, 6))
            words = list(rng.choice(vocab, n))
            sentence = " ".join(words).capitalize() + ". "
            char = 0
            for k, w in enumerate(words):
                text = words[0].capitalize() if k == 0 else w
                miss = rng.random() < unmatched
                rows.append(
                    dict(
                        type="Word",
                        text=text,
                        start=round(t, 3),
                        duration=0.2,
                        timeline=tl,
                        sentence="" if miss else sentence,
                        sentence_char=np.nan if miss else float(char),
                        split=("train", "val")[si % 2],
                        language="english",
                    )
                )
                char += len(text) + 1
                t += 0.35
            t += 0.5
    return pd.DataFrame(rows)


def test_extract_sentences_matches_reference(ref):
    from algonauts2025_tpu.data.enhancers import _extract_sentences

    frame = _annotated_words()
    ours = _extract_sentences(frame)
    theirs = ref.enhancers._extract_sentences(frame)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        assert a.text == b.text
        assert a.timeline == b.timeline
        assert a.start == pytest.approx(b.start)
        assert a.duration == pytest.approx(b.duration)


def test_assign_sentence_split_matches_reference(ref):
    from algonauts2025_tpu.data.enhancers import AssignSentenceSplit

    for ratios in ((0.7, 0.2, 0.1), (1.0, 0.0, 0.0)):
        frame = _annotated_words()
        ours = AssignSentenceSplit(
            ratios=ratios, seed=5, max_unmatched_ratio=0.5
        )(frame.copy())
        theirs = ref.enhancers.AssignSentenceSplit(
            ratios=ratios, seed=5, max_unmatched_ratio=0.5
        )(frame.copy())
        a = ours["split"].fillna("#na#").tolist()
        b = theirs["split"].fillna("#na#").tolist()
        assert a == b, ratios


def test_add_context_matches_reference(ref):
    from algonauts2025_tpu.data.enhancers import AddContextToWords

    for kwargs in (
        dict(sentence_only=False, max_context_len=12, split_field="split"),
        dict(sentence_only=True, split_field=""),
    ):
        frame = _annotated_words()
        ours = AddContextToWords(**kwargs)(frame.copy())
        theirs = ref.enhancers.AddContextToWords(**kwargs)(frame.copy())
        assert ours["context"].tolist() == theirs["context"].tolist(), kwargs


def test_merge_sentences_matches_reference(ref):
    from algonauts2025_tpu.data.enhancers import _extract_sentences, _merge_sentences

    frame = _annotated_words(unmatched=0.0)
    sentences = _extract_sentences(frame)
    ref_sentences = ref.enhancers._extract_sentences(frame)
    for kwargs in (dict(min_duration=3.0), dict(min_words=6), dict()):
        ours = _merge_sentences(sentences, **kwargs)
        theirs = ref.enhancers._merge_sentences(ref_sentences, **kwargs)
        assert [[s.text for s in g] for g in ours] == [
            [s.text for s in g] for g in theirs
        ], kwargs


def test_segments_match_reference(ref, tmp_path):
    from algonauts2025_tpu.core.segments import list_segments, validate_events

    frame = _event_frame(tmp_path, n_words=60, total=400.0)
    ours_events = validate_events(frame.copy())
    theirs_events = ref.segments.validate_events(frame.copy())
    pd.testing.assert_frame_equal(
        ours_events, theirs_events, check_dtype=False, check_like=True
    )

    ours_segs = list_segments(ours_events)
    theirs_segs = ref.segments.list_segments(theirs_events)
    assert len(ours_segs) == len(theirs_segs)
    for a, b in zip(ours_segs, theirs_segs):
        assert a.start == pytest.approx(b.start)
        assert a.duration == pytest.approx(b.duration)
        np.testing.assert_array_equal(np.sort(a._index), np.sort(b._index))

def test_match_list_matches_reference(ref):
    """Fuzzy alignment parity on random word/int sequences, both modes.

    The rewrite pairs merged opcode blocks; the reference pairs
    per-position editops — these must select identical index pairs,
    including the subtle unequal-length replace regions in 'keep' mode.
    """
    from algonauts2025_tpu.data.text_match import match_list

    rng = np.random.default_rng(7)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "far", "up"]
    for trial in range(25):
        n = int(rng.integers(3, 40))
        a = [vocab[i] for i in rng.integers(0, len(vocab), n)]
        # derive b by random edits: drops, dupes, substitutions
        b = []
        for w in a:
            r = rng.random()
            if r < 0.15:
                continue  # drop
            if r < 0.30:
                b.append(vocab[int(rng.integers(0, len(vocab)))])  # substitute
            else:
                b.append(w)
            if rng.random() < 0.10:
                b.append(vocab[int(rng.integers(0, len(vocab)))])  # insert
        if not b:
            b = [a[0]]
        for on_replace in ("delete", "keep"):
            ours = match_list(np.array(a), np.array(b), on_replace=on_replace)
            theirs = ref.utils.match_list(
                np.array(a), np.array(b), on_replace=on_replace
            )
            np.testing.assert_array_equal(ours[0], theirs[0], err_msg=f"{trial} {on_replace} A")
            np.testing.assert_array_equal(ours[1], theirs[1], err_msg=f"{trial} {on_replace} B")
        # string inputs too
        sa, sb = " ".join(a), " ".join(b)
        ours = match_list(sa, sb)
        theirs = ref.utils.match_list(sa, sb)
        np.testing.assert_array_equal(ours[0], theirs[0])
        np.testing.assert_array_equal(ours[1], theirs[1])


def test_diverse_subset_matches_reference():
    """Greedy most-diverse run selection parity with the reference
    (algonauts2025/grids/average_submissions.py:19-53), including tie
    behavior, on random correlation matrices."""
    ref_path = Path("/root/reference/algonauts2025/grids/average_submissions.py")
    if not ref_path.exists():
        pytest.skip("reference grids not mounted")
    src = ref_path.read_text()
    # isolate the pure selection function (module imports torch/tqdm)
    ns: dict = {}
    fn_src = src[src.index("def select_diverse_subset") : src.index("def get_k_most_diverse_indices")]
    exec(fn_src, ns)  # noqa: S102 - reference oracle
    ref_select = ns["select_diverse_subset"]

    from algonauts2025_tpu.grids.average_submissions import select_diverse_subset

    rng = np.random.default_rng(3)
    for trial in range(10):
        n = int(rng.integers(3, 30))
        x = rng.standard_normal((n, 50))
        corr = np.corrcoef(x)
        for k in (1, 2, min(5, n), n):
            ours = select_diverse_subset(corr, k)
            theirs = ref_select(corr, k)
            assert list(ours) == list(theirs), (trial, k)


def test_event_dict_round_trip_matches_reference(ref):
    """from_dict/to_dict parity for the rewritten event taxonomy: same
    rows (extras, extra__ prefixes, NaN cells, stray columns) must produce
    identical flattened dicts through both stacks."""
    from algonauts2025_tpu.core import events as ours

    rows = [
        {"type": "Event", "timeline": "tl", "start": 1.5, "duration": 2.0,
         "note": "stray", "extra__tag": 7},
        {"type": "Word", "timeline": "tl", "start": 0.25, "duration": 0.4,
         "text": "hello", "sentence": "hello world", "sentence_char": 0,
         "context": "hello", "bonus": 3.5},
        {"type": "Word", "timeline": "tl", "start": 2.0, "duration": float("nan"),
         "text": "nanless", "sentence_char": float("nan")},
        {"type": "Text", "timeline": "tl", "start": 9.0, "duration": 1.0,
         "text": "a line of text", "extra__source": "tsv"},
        {"type": "Sentence", "timeline": "tl", "start": 4.0, "duration": 2.5,
         "text": "s", "split": "train"},
    ]
    for row in rows:
        mine = ours.Event.from_dict(dict(row))
        theirs = ref.events.Event.from_dict(dict(row))
        d_mine = mine.to_dict()
        d_theirs = theirs.to_dict()
        assert set(d_mine) == set(d_theirs), row
        for key in d_theirs:
            a, b = d_mine[key], d_theirs[key]
            assert (a == b) or (pd.isna(a) and pd.isna(b)), (row, key, a, b)
        assert mine.stop == theirs.stop


def test_extract_sentences_cross_timeline_final_word_quirk(ref):
    """The reference appends the FINAL word to the open sentence before its
    boundary checks (it compares the word with itself), so a final word in
    a NEW timeline is absorbed across the boundary — yielding either a
    corrupt cross-timeline sentence or, when the arithmetic goes negative,
    a pydantic ValidationError.  Both variants must match exactly."""
    from algonauts2025_tpu.data.enhancers import (
        _extract_sentences as ours_extract,
    )

    def frame(b_start):
        return pd.DataFrame(
            [
                dict(type="Word", text="hello", sentence="hello there",
                     sentence_char=0, start=10.0, duration=0.3, timeline="A"),
                dict(type="Word", text="there", sentence="hello there",
                     sentence_char=6, start=10.4, duration=0.3, timeline="A"),
                dict(type="Word", text="bye", sentence="bye",
                     sentence_char=0, start=b_start, duration=0.3, timeline="B"),
            ]
        )

    # positive-duration variant: same single absorbed sentence
    theirs = ref.enhancers._extract_sentences(frame(20.0))
    mine = ours_extract(frame(20.0))
    assert len(theirs) == len(mine) == 1
    for a, b in zip(mine, theirs):
        assert (a.timeline, a.text) == (b.timeline, b.text)
        assert abs(a.start - b.start) < 1e-9
        assert abs(a.duration - b.duration) < 1e-9
    # negative-duration variant: both raise the same validation error
    import pydantic

    with pytest.raises(pydantic.ValidationError):
        ref.enhancers._extract_sentences(frame(0.0))
    with pytest.raises(pydantic.ValidationError):
        ours_extract(frame(0.0))


def test_defaults_config_covers_reference_keys(tmp_path, monkeypatch):
    """Every dotted key of the reference master config (grids/defaults.py)
    must exist in ours — the grid/cache surface is key-for-key parity;
    extras beyond it are the documented TPU knobs (MIGRATION.md)."""
    ref_path = Path("/root/reference/algonauts2025/grids/defaults.py")
    monkeypatch.chdir(tmp_path)  # the reference mkdirs relative paths on import
    spec = importlib.util.spec_from_file_location("ref_defaults", ref_path)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    monkeypatch.setenv("ALGONAUTS_TPU_DATA", str(tmp_path / "d"))
    monkeypatch.setenv("ALGONAUTS_TPU_SAVE", str(tmp_path / "s"))
    monkeypatch.setenv("ALGONAUTS_TPU_CACHE", str(tmp_path / "c"))
    import importlib as _il

    import algonauts2025_tpu.grids.defaults as ours_mod

    ours_mod = _il.reload(ours_mod)  # re-read env-dependent paths

    def keys(d, prefix=""):
        out = set()
        for k, v in d.items():
            kk = f"{prefix}{k}"
            if isinstance(v, dict):
                out |= keys(v, kk + ".")
            elif isinstance(v, list) and v and isinstance(v[0], dict):
                out.add(kk + "[]")
                for item in v:
                    out |= {kk + "[]." + sub for sub in keys(item)}
            else:
                out.add(kk)
        return out

    ref_keys = keys(ref_mod.default_config)
    our_keys = keys(ours_mod.default_config)
    # enhancer entries: the reference keys them by arbitrary dict names;
    # compare the enhancer configs' own key sets instead
    ref_enh = {k.split("enhancers.", 1)[1].split(".", 1)[1]
               for k in ref_keys if "enhancers." in k and "." in k.split("enhancers.", 1)[1]}
    our_enh = {k.split("enhancers.", 1)[1].split(".", 1)[1]
               for k in our_keys if "enhancers." in k and "." in k.split("enhancers.", 1)[1]}
    assert ref_enh <= our_enh, f"enhancer keys missing: {ref_enh - our_enh}"
    ref_rest = {k for k in ref_keys if "enhancers" not in k}
    our_rest = {k for k in our_keys if "enhancers" not in k}
    missing = ref_rest - our_rest
    assert not missing, f"reference defaults keys missing from ours: {sorted(missing)}"
