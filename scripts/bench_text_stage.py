"""Probe the text-stage chain path: tunnel D2H rate, CHAIN_CHUNK sweep,
async-host-copy variant.  Run on the real chip (one device job at a time)."""
import os
import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np

from algonauts2025_tpu.core.events import Word
from algonauts2025_tpu.features.text import HashTokenizer, JaxTextBackbone, LLAMA3p2
from algonauts2025_tpu.models.backbones.llama import LLAMA_3P2_3B, LlamaBackbone


def measure_d2h(nbytes: int = 11_400_000) -> float:
    """Today's tunnel D2H rate (MB/s) on a bf16 array of the stage's size.

    A FRESH array per fetch: jax.Array caches its host copy, so repeated
    np.asarray on the same array measures nothing after the first."""
    n = nbytes // 2
    fn = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16))
    rates = []
    for i in range(3):
        x = fn(jax.random.PRNGKey(i))
        jax.block_until_ready(x)
        t0 = time.time()
        np.asarray(x)
        rates.append(nbytes / (time.time() - t0) / 1e6)
    print(f"  d2h per-fetch MB/s: {[f'{r:.1f}' for r in rates]}", file=sys.stderr)
    return float(np.median(rates))


def main() -> None:
    print("devices:", jax.devices(), file=sys.stderr)
    rate = measure_d2h()
    print(f"D2H rate today: {rate:.1f} MB/s -> 11.4 MB floor = {11.4 / rate * 1000:.0f} ms")

    rng = np.random.RandomState(0)
    vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "neural", "cortex", "movie", "watching", "brain", "signal"]
    words = [vocab[rng.randint(len(vocab))] for _ in range(60)]
    contexts = []
    for i in range(60):
        contexts.append(" ".join(words[: i + 1]))

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

    for chunk in (int(a) for a in (os.environ.get("CHUNKS", "8,16,32").split(","))):
        LLAMA3p2.CHAIN_CHUNK = chunk
        ts = []
        for _ in range(4):
            t0 = time.time()
            out = list(feat._compute(events))
            assert len(out) == 60
            ts.append(time.time() - t0)
        print(f"CHAIN_CHUNK={chunk:3d}: passes {['%.2f' % t for t in ts]} median {np.median(ts[1:]):.3f}s")


if __name__ == "__main__":
    main()
