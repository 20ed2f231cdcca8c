"""Probe: bf16 vs w8a8 (dynamic / static activation scales) matmul rates.

Shapes = ViT-G non-attention hot matmuls at window-batch 4 (32768 rows):
qkv/proj (1408->1408), fc1 (1408->6144), fc2 (6144->1408).  Last round's
finding: dynamic per-row activation quantization (max/round/cast passes)
eats the 2x int8 MXU rate.  Static per-tensor scales (calibrated offline
for a frozen backbone) remove the max pass — this probe measures whether
that recovers the gain.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

ROWS = 32768
SHAPES = [(1408, 1408), (1408, 6144), (6144, 1408)]
R = 10


def sync(x):
    return float(jax.device_get(x))  # x is already a 0-d scalar


def timeit(name, fn, *args):
    j = jax.jit(lambda *a: jnp.ravel(fn(*a))[0])
    sync(j(*args))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        sync(j(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best * 1e3:8.2f} ms")
    return best


def chain(fn, x, ws, reps=R):
    """Run reps x len(ws) matmuls serialized through a carry.

    The shapes chain 1408 -> 1408 -> 6144 -> 1408, so the final h matches
    x and feeds the next iteration (prevents folding/DCE)."""

    def body(_, x):
        h = x
        for w in ws:
            h = fn(h, w)
        return (x + 0.001 * h).astype(x.dtype)

    return jax.lax.fori_loop(0, reps, body, x)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (ROWS, 1408), jnp.bfloat16)
    ws = [
        jax.random.normal(jax.random.PRNGKey(i + 1), s, jnp.bfloat16) * 0.02
        for i, s in enumerate(SHAPES)
    ]

    flops = 2 * ROWS * sum(k * n for k, n in SHAPES) * R

    def report(name, sec):
        print(f"  -> {flops / sec / 1e12:.1f} TF/s equivalent")

    t = timeit("bf16", lambda x: chain(lambda h, w: jax.lax.dot(h, w), x, ws), x)
    report("bf16", t)

    from algonauts2025_tpu.ops.quant import quantize_weight

    wqs = [quantize_weight(w) for w in ws]

    def int8_dynamic(h, wq):
        w_q, w_s = wq
        hf = h.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0, 1e-12)
        h_q = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            h_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * sx * w_s[None]).astype(jnp.bfloat16)

    t = timeit(
        "int8-dyn", lambda x: chain(lambda h, i: int8_dynamic(h, i), x, wqs), x
    )
    report("int8-dyn", t)

    # static: one precomputed scalar activation scale per matmul
    SX = 0.05  # stands in for a calibrated constant

    def int8_static(h, wq):
        w_q, w_s = wq
        h_q = jnp.clip(
            jnp.round(h.astype(jnp.float32) * (1.0 / SX)), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            h_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * (SX) * w_s[None]).astype(jnp.bfloat16)

    t = timeit(
        "int8-static", lambda x: chain(lambda h, i: int8_static(h, i), x, wqs), x
    )
    report("int8-static", t)


if __name__ == "__main__":
    main()
