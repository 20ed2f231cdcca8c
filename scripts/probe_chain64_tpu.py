"""Diagnose the CHAIN_CHUNK=64 feature divergence seen on chip.

probe_text_chunk.py found chunk=64 outputs differ from chunk=8/16/32 by
max-abs 1.0 on the full Llama-3.2-3B on the TPU, while the same sweep on
CPU (tiny backbone) is exact to 2.4e-6.  chunk=32's second dispatch has
the SAME jit signature (ids width 64, wb 64, pool 64x64) and passed, so
this isolates which words diverge and against the batched ground truth.

Run attached to the chip: python scripts/probe_chain64_tpu.py
"""

import sys

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401
import jax
import numpy as np


def main() -> None:
    import jax.numpy as jnp

    from algonauts2025_tpu.core.events import Word
    from algonauts2025_tpu.features.text import (
        HashTokenizer,
        JaxTextBackbone,
        LLAMA3p2,
    )
    from algonauts2025_tpu.models.backbones.llama import LLAMA_3P2_3B, LlamaBackbone

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    n = 60
    vocab = (
        "the quick brown fox jumps over a lazy dog while rain falls on hills".split()
    )
    words = [vocab[i % len(vocab)] for i in range(n)]
    contexts = [" ".join(words[max(0, i - 256) : i + 1]) for i in range(n)]
    events = [
        Word(start=0.5 * i, duration=0.4, text=w, context=c, timeline="bench")
        for i, (w, c) in enumerate(zip(words, contexts))
    ]

    model = LlamaBackbone(LLAMA_3P2_3B)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    backbone = JaxTextBackbone(model, params, HashTokenizer(LLAMA_3P2_3B.vocab_size), 0)

    feat = LLAMA3p2()
    feat.set_backbone(backbone)

    outs = {}
    for chunk in (16, 64):
        LLAMA3p2.CHAIN_CHUNK = chunk
        outs[chunk] = np.stack(list(feat._compute(events)))
    LLAMA3p2.CHAIN_CHUNK = 16

    # batched ground truth (no chain path)
    class _NoChain:
        def __init__(self, bb):
            self._bb = bb

        def __getattr__(self, k):
            if k in ("pooled_states_chain_async",):
                raise AttributeError(k)
            return getattr(self._bb, k)

    nf = LLAMA3p2()
    nf.set_backbone(_NoChain(backbone))
    ref = np.stack(list(nf._compute(events)))

    d16 = np.abs(outs[16] - ref).max(axis=(1, 2))
    d64 = np.abs(outs[64] - ref).max(axis=(1, 2))
    print("chunk16 vs batched: max", float(d16.max()), flush=True)
    print("chunk64 vs batched: max", float(d64.max()), flush=True)
    bad = np.nonzero(d64 > 1e-2)[0]
    print("chunk64 bad words:", bad.tolist(), flush=True)
    if bad.size:
        i = int(bad[0])
        a, b = outs[64][i], ref[i]
        print(f"word {i}: |a| {np.abs(a).mean():.4f} |ref| {np.abs(b).mean():.4f} "
              f"corr {np.corrcoef(a.ravel(), b.ravel())[0,1]:.4f}", flush=True)
        # is it another word's row? check correlation against neighbors
        for j in range(max(0, i - 2), min(n, i + 3)):
            c = np.corrcoef(a.ravel(), ref[j].ravel())[0, 1]
            print(f"  corr vs ref word {j}: {c:.4f}", flush=True)


if __name__ == "__main__":
    main()
