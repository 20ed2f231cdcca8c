"""Chain fast path for the text feature (r3).

Rolling word contexts are nested prefixes, so ONE causal forward over the
longest context reproduces every per-context forward's hidden states at
that prefix's tail positions (shared absolute positions + causal
attention).  These tests pin the fast path's exactness against the
batched reference path and its fallback behavior when chains break.
"""

import numpy as np
import pytest

from algonauts2025_tpu.core.events import Word
from algonauts2025_tpu.features.text import LLAMA3p2, TinyTextBackbone


VOCAB = "the quick brown fox jumps over a lazy dog near misty hills".split()


def _word_events(n: int, context_cap: int | None = None) -> list[Word]:
    words = [VOCAB[i % len(VOCAB)] for i in range(n)]
    events = []
    for i, w in enumerate(words):
        lo = 0 if context_cap is None else max(0, i + 1 - context_cap)
        ctx = " ".join(words[lo : i + 1])
        events.append(
            Word(start=0.5 * i, duration=0.4, text=w, context=ctx, timeline="t")
        )
    return events


@pytest.fixture(scope="module")
def feat():
    f = LLAMA3p2(model_name="tiny-random")
    f.set_backbone(TinyTextBackbone())  # fp32 params -> tight comparisons
    return f


def test_chain_matches_batched_exactly(feat):
    events = _word_events(24)
    chain = [np.asarray(x) for x in feat._compute(events)]
    batched = [np.asarray(x) for x in feat._compute_batched(feat.backbone, events)]
    assert len(chain) == len(batched) == 24
    for c, b in zip(chain, batched):
        np.testing.assert_allclose(c, b, rtol=2e-5, atol=2e-6)


def test_chain_run_splitting_on_token_limit(feat):
    """Contexts that exceed max_context_tokens break the chain and route
    through the (left-truncating) batched path — outputs must still match
    the batched path end to end."""
    events = _word_events(30)
    short = feat.model_copy(update={"max_context_tokens": 12})
    short.set_backbone(feat.backbone)
    runs = short._chain_runs(short.backbone, events)
    assert any(not r[0] for r in runs)  # something fell off the chain
    chain = [np.asarray(x) for x in short._compute(events)]
    batched = [
        np.asarray(x) for x in short._compute_batched(short.backbone, events)
    ]
    for c, b in zip(chain, batched):
        np.testing.assert_allclose(c, b, rtol=2e-5, atol=2e-6)


def test_chain_breaks_on_non_prefix_contexts(feat):
    """Sliding-window contexts (left-truncated at the WORD level) are not
    prefixes of each other: the splitter must demote them to the batched
    path rather than pooling wrong positions."""
    events = _word_events(20, context_cap=4)
    runs = feat._chain_runs(feat.backbone, events)
    # the first 4 words chain (still true prefixes); the sliding tail must
    # not be treated as one chain
    tail = [r for r in runs if len(r[1]) > 4 and r[0]]
    assert not tail
    chain = [np.asarray(x) for x in feat._compute(events)]
    batched = [np.asarray(x) for x in feat._compute_batched(feat.backbone, events)]
    for c, b in zip(chain, batched):
        np.testing.assert_allclose(c, b, rtol=2e-5, atol=2e-6)


def test_single_word_and_empty_context(feat):
    events = [
        Word(start=0.0, duration=0.4, text="hi", context="hi", timeline="t"),
        Word(start=0.5, duration=0.4, text="there", context="hi there", timeline="t"),
    ]
    out = [np.asarray(x) for x in feat._compute(events)]
    ref = [np.asarray(x) for x in feat._compute_batched(feat.backbone, events)]
    for c, b in zip(out, ref):
        np.testing.assert_allclose(c, b, rtol=2e-5, atol=2e-6)
