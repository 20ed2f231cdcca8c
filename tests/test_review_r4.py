"""Regression tests for the round-4 advisor findings (ADVICE.md r3)."""

import numpy as np
import pytest


def test_incremental_tokenizer_periodic_recheck():
    """A tokenizer whose per-word concatenation first diverges AFTER the
    initial 32 verified contexts must still be caught: the fast path
    re-verifies every 64th context forever (ADVICE r3 #1)."""
    from algonauts2025_tpu.features.text import TinyTextBackbone

    bb = TinyTextBackbone()
    contexts = [f"word{i} plus tail" for i in range(256)]
    for t in contexts[:40]:
        bb._tokenize(t)
    assert bb._inc_enabled  # healthy tokenizer: fast path stays on

    # now the "tokenizer" changes behaviour (simulates a model_name swap
    # onto a tokenizer where cross-word merges appear late in a corpus)
    orig = bb._tokenize_full
    bb._tokenize_full = lambda t: orig(t) + [7] if " " in t else orig(t)
    for t in contexts[40:]:
        bb._tokenize(t)
        if not bb._inc_enabled:
            break
    assert not bb._inc_enabled, "divergence after the first 32 went unnoticed"


def test_fmri_orientation_ambiguous_within_tolerance_raises(tmp_path):
    """Orientation inference must refuse files where BOTH axes are within
    the +/-1 tolerance, not only the exact-tie case (ADVICE r3 #2): an
    11 x 9 file declared as 10 timesteps is off by one on each axis —
    silently picking either orientation risks a transposed recording."""
    from algonauts2025_tpu.core.events import Event

    p = tmp_path / "ambig.npy"
    np.save(p, np.zeros((11, 9), dtype=np.float32))
    ev = Event.from_dict(
        dict(
            type="Fmri",
            filepath=str(p),
            start=0.0,
            duration=10.0,
            frequency=1.0,
            timeline="t",
            subject="s1",
        )
    )
    with pytest.raises(ValueError, match="ambiguous"):
        ev.read()
