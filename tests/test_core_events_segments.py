"""Event taxonomy, segmentation and splitting tests."""

import numpy as np
import pandas as pd
import pytest

from algonauts2025_tpu.core import (
    HEMODYNAMIC_LAG,
    WINDOW_SECONDS,
    DeterministicSplitter,
    Event,
    EventTypesHelper,
    Sound,
    Word,
    chunk_events,
    list_segments,
    validate_events,
)
from algonauts2025_tpu.io import wav as wavio


def _word(start, dur=0.3, text="hello", timeline="tl"):
    return {
        "type": "Word",
        "start": start,
        "duration": dur,
        "text": text,
        "timeline": timeline,
        "language": "english",
    }


def test_event_registry():
    assert "Word" in Event._CLASSES
    assert Event._CLASSES["Word"] is Word
    helper = EventTypesHelper("Word")
    assert "Word" in helper.names


def test_event_roundtrip():
    w = Word(start=1.0, duration=0.5, text="hi", timeline="t", extra={"k": 1})
    d = w.to_dict()
    assert d["type"] == "Word"
    assert d["k"] == 1
    w2 = Event.from_dict(d)
    assert isinstance(w2, Word)
    assert w2.text == "hi"
    assert w2.extra["k"] == 1


def test_validate_events_sorting():
    df = pd.DataFrame([_word(2.0), _word(0.5), _word(1.0, dur=1.0)])
    out = validate_events(df)
    assert list(out.columns[:4]) == ["type", "start", "duration", "timeline"]
    assert out.start.is_monotonic_increasing
    assert "stop" in out.columns


def test_validate_events_requires_type():
    with pytest.raises(ValueError):
        validate_events(pd.DataFrame([{"start": 0.0}]))


def test_list_segments_windows():
    # one timeline spanning ~400 s -> 3 windows of 149 s starting at -4.47
    rows = [_word(t, dur=1.0) for t in np.arange(0, 400, 10.0)]
    df = validate_events(pd.DataFrame(rows))
    segs = list_segments(df)
    assert len(segs) == 3
    assert segs[0].start == pytest.approx(0.0 - HEMODYNAMIC_LAG)
    assert segs[0].duration == WINDOW_SECONDS
    assert segs[1].start == pytest.approx(segs[0].start + WINDOW_SECONDS)
    # all events overlapping the window are collected
    assert len(segs[0].ns_events) == 15
    assert all(e.start < segs[0].stop for e in segs[0].ns_events)


def test_segment_events_roundtrip():
    rows = [_word(t) for t in [0.0, 1.0, 2.0]]
    df = validate_events(pd.DataFrame(rows))
    segs = list_segments(df)
    ev = segs[0].events
    assert len(ev) == 3
    assert set(ev.type) == {"Word"}


def test_deterministic_splitter():
    splitter = DeterministicSplitter(ratios={"train": 0.9, "val": 0.1})
    outs = [splitter(f"uid{i}") for i in range(200)]
    assert outs == [splitter(f"uid{i}") for i in range(200)]  # deterministic
    frac_val = sum(o == "val" for o in outs) / len(outs)
    assert 0.02 < frac_val < 0.25
    # different (integer) seeds give different assignments; float seeds are
    # precision-collapsed against the 256-bit hash (reference semantics)
    s2 = DeterministicSplitter(ratios={"train": 0.9, "val": 0.1}, seed=1)
    assert [s2(f"uid{i}") for i in range(200)] != outs


def test_sound_event_and_chunking(tmp_path):
    sr = 16000
    data = np.sin(np.linspace(0, 100, sr * 10)).astype(np.float32)
    fp = tmp_path / "a.wav"
    wavio.write(fp, data, sr)

    snd = Sound(start=0.0, timeline="tl", filepath=str(fp))
    assert snd.frequency == sr
    assert snd.duration == pytest.approx(10.0)
    wav = snd.read()
    assert wav.shape == (sr * 10, 1)

    df = validate_events(
        pd.DataFrame([{**snd.to_dict(), "timeline": "tl"}])
    )
    out = chunk_events(df, "Sound", max_duration=4.0)
    sounds = out[out.type == "Sound"]
    assert len(sounds) == 3
    np.testing.assert_allclose(sorted(sounds.duration), [2.0, 4.0, 4.0])
    np.testing.assert_allclose(sorted(sounds.offset), [0.0, 4.0, 8.0])
    # chunked reads match the original samples
    chunk = Sound.from_dict(sounds.iloc[1].to_dict())
    wav_chunk = chunk.read()
    start = int(chunk.offset * sr)
    np.testing.assert_allclose(
        wav_chunk[:, 0], data[start : start + len(wav_chunk)], atol=1e-4
    )


def test_split_min_duration(tmp_path):
    sr = 8000
    fp = tmp_path / "b.wav"
    wavio.write(fp, np.zeros(sr * 10, dtype=np.float32), sr)
    snd = Sound(start=0.0, timeline="tl", filepath=str(fp))
    parts = snd._split([4.0, 9.5], min_duration=1.0)
    # 9.5 dropped (only 0.5 s after), so parts are [0,4) and [4,10)
    assert len(parts) == 2
    assert parts[1].offset == 4.0
    assert parts[1].duration == pytest.approx(6.0)


def test_segment_creator_unregistered_only_timeline():
    """A timeline whose rows are ALL unregistered event types (tolerated by
    validate_events with a warning, dropped by extract_events) gets an
    EMPTY creator — reference defaultdict behavior — not a KeyError
    (r4 review)."""
    import warnings

    import pandas as pd

    from algonauts2025_tpu.core.segments import SegmentCreator

    df = pd.DataFrame(
        [
            {"type": "Word", "timeline": "tl1", "start": 0.0, "duration": 1.0,
             "text": "hi", "context": "hi"},
            {"type": "EyeTrack", "timeline": "tl2", "start": 0.0, "duration": 1.0},
        ]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        creators = SegmentCreator.from_obj(df)
    assert sorted(creators) == ["tl1", "tl2"]
    seg = creators["tl2"].select(0.0, 1.0)
    assert seg.ns_events == []
    assert len(creators["tl1"].select(0.0, 1.0).ns_events) == 1
