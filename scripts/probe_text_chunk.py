"""Sweep LLAMA3p2.CHAIN_CHUNK on the bench text stage (r4 headline gap).

The text stage is D2H-floor-bound (the contract-fixed (L+1, W, 3072) bf16
layer-stack fetch), but the measured stage time sits ~0.17 s above the
floor at CHAIN_CHUNK=16.  Two competing effects:

- smaller chunks pipeline the fetch behind the next sub-chain's compute
  (good when compute is large), but pay a fixed per-fetch round-trip
  latency and re-forward the shared prefix once per sub-chain;
- bigger chunks amortize the round trips and cut total compute linearly
  on saturated chains (every sub-chain forward runs over the chunk's
  longest context), but delay the first fetch by one chunk's compute.

This measures the real production path (LLAMA3p2._compute over Word
events, exactly bench.py's construction) at several chunk sizes on the
real tunnel.  Run on chip attach:
    python scripts/probe_text_chunk.py          # BENCH_STIM_SECONDS=30
"""

import os
import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import numpy as np


def main() -> None:
    print("devices:", jax.devices(), file=sys.stderr)
    import jax.numpy as jnp

    from algonauts2025_tpu.core.events import Word
    from algonauts2025_tpu.features.text import (
        HashTokenizer,
        JaxTextBackbone,
        LLAMA3p2,
    )
    from algonauts2025_tpu.models.backbones.llama import LLAMA_3P2_3B, LlamaBackbone

    stim_seconds = float(os.environ.get("BENCH_STIM_SECONDS", 30))
    n_words = int(stim_seconds * 2.0)
    vocab = (
        "the quick brown fox jumps over a lazy dog while rain falls on hills".split()
    )
    words = [vocab[i % len(vocab)] for i in range(n_words)]
    contexts = [" ".join(words[max(0, i - 256) : i + 1]) for i in range(n_words)]

    model = LlamaBackbone(LLAMA_3P2_3B)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    backbone = JaxTextBackbone(model, params, HashTokenizer(LLAMA_3P2_3B.vocab_size), 0)

    feat = LLAMA3p2()
    feat.set_backbone(backbone)
    events = [
        Word(start=0.5 * i, duration=0.4, text=w, context=c, timeline="bench")
        for i, (w, c) in enumerate(zip(words, contexts))
    ]

    results = {}
    baseline = None
    for chunk in (8, 16, 32, 64, 128):
        LLAMA3p2.CHAIN_CHUNK = chunk
        outs = list(feat._compute(events))  # warmup (compile this chunking)
        assert len(outs) == len(events)
        if baseline is None:
            baseline = np.stack(outs)
        else:
            # Chunking is STRUCTURALLY exact (sub-chains of a prefix chain;
            # fp32 CPU agreement 2.4e-6), but a different chunk can land the
            # forward in a different token-width bucket, and on device bf16
            # accumulates ~1 ULP/layer of reordering noise across the 28
            # scanned layers (measured r4: max-abs 1.0 at |x|~68, corr
            # 0.999996 — the batched production path shows the identical
            # bucket-dependence).  Gate on correlation + median rel, not a
            # flat absolute tolerance.
            cur = np.stack(outs)
            corr = float(np.corrcoef(cur.ravel(), baseline.ravel())[0, 1])
            med_rel = float(
                np.median(np.abs(cur - baseline) / (np.abs(baseline) + 1e-3))
            )
            assert corr > 0.9999 and med_rel < 1e-3, (
                f"CHAIN_CHUNK={chunk} changed features: corr={corr} med_rel={med_rel}"
            )
        times = []
        for _ in range(3):
            t0 = time.time()
            out = list(feat._compute(events))
            assert len(out) == len(events)
            times.append(time.time() - t0)
        results[chunk] = sorted(times)[1]
        print(f"CHAIN_CHUNK={chunk:4d}: median {results[chunk]:.3f}s "
              f"(passes {['%.3f' % t for t in sorted(times)]})", file=sys.stderr)

    best = min(results, key=results.get)
    print({"stim_seconds": stim_seconds, "results": results, "best": best})


if __name__ == "__main__":
    main()
