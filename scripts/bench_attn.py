"""Microbench for the ViT-G attention kernel variants on the real chip.

Times R kernel invocations inside ONE jit (lax.fori_loop with a serializing
carry) so the remote-dispatch round trip is paid once.  Shapes match the
video path: window batch 4 x 22 heads x 8192 tokens x head_dim 64.

Usage: python scripts/bench_attn.py [variant ...]
Variants: fast (current), bounded, packed, all (default: fast bounded)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

B, H, T, D = 4, 22, 8192, 64
R = 8  # kernel calls per timed dispatch


def timeit(name, fn, q, k, v, reps=3):
    def loop(q, k, v):
        def body(_, q):
            # serialize: the output IS the next q (can't be folded away)
            return fn(q, k, v).astype(q.dtype)

        return jax.lax.fori_loop(0, R, body, q)

    j = jax.jit(lambda q, k, v: loop(q, k, v)[0, 0, 0, 0])
    sync = lambda x: float(jax.device_get(x))  # axon: block_until_ready lies
    sync(j(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(j(q, k, v))
        best = min(best, (time.perf_counter() - t0) / R)
    ms = best * 1e3
    per_win_40 = ms * 40 / B / 1e3
    print(f"{name:18s} {ms:8.2f} ms/call   ({per_win_40:.3f} s/window over 40 layers)")
    return ms


def rel_err(name, fn, fn_ref, q, k, v):
    # one jitted computation returning two scalars: eager elementwise ops
    # would cost a remote round trip each on axon
    @jax.jit
    def stats(q, k, v):
        a = fn(q, k, v).astype(jnp.float32)
        b = fn_ref(q, k, v).astype(jnp.float32)
        err = jnp.abs(a - b)
        return err.max(), err.mean() / jnp.abs(b).mean()

    mx, rel = jax.device_get(stats(q, k, v))
    print(f"{name:18s} max_abs={float(mx):.2e} mean_rel={float(rel):.2e}")


def main():
    variants = sys.argv[1:] or ["fast", "bounded"]
    if variants == ["all"]:
        variants = ["fast", "bounded", "packed"]
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, T, D), jnp.bfloat16)

    from algonauts2025_tpu.ops import flash_attention as fa

    fns = {}
    fns["default"] = lambda q, k, v: fa.flash_attention(q, k, v)
    fns["fast"] = lambda q, k, v: fa._fast_flash(q, k, v, 512, 2048, False)
    fns["fastb16"] = lambda q, k, v: fa._fast_flash(
        q, k, v, 512, 2048, False, jnp.bfloat16
    )
    fns["bounded"] = lambda q, k, v: fa._bounded_flash(q, k, v, 512, 2048, False)
    fns["boundb16"] = lambda q, k, v: fa._bounded_flash(
        q, k, v, 512, 2048, False, jnp.bfloat16
    )
    fns["packed"] = lambda q, k, v: fa.flash_attention_packed(q, k, v)

    def make(name):
        if name in fns:
            return fns[name]
        # "bounded:qb:kvb" block-size sweep entries
        parts = name.split(":")
        if parts[0] == "bounded" and len(parts) == 3:
            qb, kvb = int(parts[1]), int(parts[2])
            return lambda q, k, v: fa._bounded_flash(q, k, v, qb, kvb, False)
        return None

    for name in variants:
        fn = make(name)
        if fn is None:
            print(f"{name}: not available, skipped")
            continue
        fns.setdefault(name, fn)
        try:
            timeit(name, fn, q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    # error vs the online-max fp32 kernel on a small slice (cheap);
    # only for the variants actually requested
    qs, ks, vs = q[:1, :2], k[:1, :2], v[:1, :2]
    ref = lambda q, k, v: fa._fast_flash(q, k, v, 512, 2048, False)
    for name in variants:
        fn = fns.get(name)
        if fn is None or name == "fast":
            continue
        try:
            rel_err(name, fn, ref, qs, ks, vs)
        except Exception as e:  # noqa: BLE001
            print(f"{name} err-check FAILED: {e}")


if __name__ == "__main__":
    main()
