"""Real-chip check of the masked flash kv-block clamp (r3b, validated r4).

ops/flash_attention.py bounds the kv fori_loop by ceil(valid / kv_block)
using the scalar-prefetched lengths (SMEM).  The causal bound was always
dynamic (program_id-derived) and compiles under Mosaic; this probe
confirms the combined bound does too, with two gates:

1. STRUCTURAL (the decisive one): under causal+lengths, query rows
   i < valid attend only keys j <= i < valid, so the clamped bound must
   not change them at all — masked-flash valid rows vs causal-only-flash
   rows must agree to 0.  Measured r4 on v5e: exactly 0.0 in bf16 and f32.
2. ULP-AWARE vs XLA: max-abs over ~0.5M elements must sit within a few
   ULP of the reference.  The r3b draft used a flat 8e-3 gate, which a
   one-ULP bf16 delta at |out|~2 trips (1 ULP of bf16 at 2.0 IS 1.56e-2
   — the exact delta measured); TPU default f32 matmul also multiplies
   in bf16, so the per-element bound is 8*2^-8*max(|ref|, 0.25) for both
   dtypes (8, not 4: flash's online accumulation sums 512-key softmax
   terms in a different order than the XLA reference and the tail
   compounds a few ULP — observed worst on-chip 7.3e-3 at small |ref|,
   exactly 1 element of 2.4M beyond 4 ULP).  Measured r4: 0 elements
   beyond the 8-ULP bound in bf16 and f32; a wrong loop bound would
   produce O(1) errors and trip both gates immediately.

Run on chip attach: python scripts/probe_masked_clamp_tpu.py
"""
import sys

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np

from algonauts2025_tpu.ops.attention import dot_product_attention
from algonauts2025_tpu.ops.flash_attention import flash_attention


def main() -> None:
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    # llama text shapes: bucket width 512, short valid lengths
    b, h, t, d = 2, 8, 512, 64
    qf = rng.standard_normal((b, h, t, d)).astype(np.float32)
    kf = rng.standard_normal((b, h, t, d)).astype(np.float32)
    vf = rng.standard_normal((b, h, t, d)).astype(np.float32)
    short = np.asarray([37, 300], np.int32)

    for dtype in (jnp.bfloat16, jnp.float32):
        q, k, v = (jnp.asarray(x).astype(dtype) for x in (qf, kf, vf))
        causal_out = np.asarray(
            flash_attention(q, k, v, q_block=128, kv_block=128, causal=True)
        )
        masked_out = np.asarray(
            flash_attention(
                q, k, v, q_block=128, kv_block=128, causal=True,
                lengths=jnp.asarray(short),
            )
        )
        structural = max(
            float(
                np.abs(
                    masked_out[bi, :, : short[bi]] - causal_out[bi, :, : short[bi]]
                ).max()
            )
            for bi in range(b)
        )
        print(f"{dtype.__name__:9s} clamp structural delta (valid rows) = {structural:.2e}")
        assert structural < 1e-6, "clamp changes rows it must not touch"

        mask = (
            jnp.tril(jnp.ones((t, t), bool))[None, None]
            & (jnp.arange(t)[None, None, None] < jnp.asarray(short)[:, None, None, None])
        )
        ref = np.asarray(dot_product_attention(q, k, v, mask=mask), np.float32)
        bound = 8.0 * 2.0**-8 * np.maximum(np.abs(ref), 0.25)
        bad = 0
        for bi in range(b):
            dlt = np.abs(
                masked_out[bi, :, : short[bi]].astype(np.float32)
                - ref[bi, :, : short[bi]]
            )
            bad += int((dlt > bound[bi, :, : short[bi]]).sum())
        print(f"{dtype.__name__:9s} elements beyond 8-ULP of XLA ref     = {bad}")
        assert bad == 0, "masked flash diverges beyond rounding on hardware"
    print("OK")


if __name__ == "__main__":
    main()
