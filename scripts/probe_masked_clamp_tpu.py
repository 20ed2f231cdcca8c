"""Real-chip check of the masked flash kv-block clamp (r3b).

ops/flash_attention.py now bounds the kv fori_loop by
ceil(valid / kv_block) using the scalar-prefetched lengths (SMEM).  The
causal bound was always dynamic (program_id-derived) and compiles under
Mosaic; this probe confirms the combined bound does too, and that a
llama-shaped masked+causal call is exact vs the XLA reference on
hardware.  Run on chip attach: python scripts/probe_masked_clamp_tpu.py
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
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    lengths = jnp.asarray([37, 300], jnp.int32)

    out = np.asarray(
        flash_attention(q, k, v, q_block=128, kv_block=512, causal=True, lengths=lengths)
    )
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    keymask = jnp.arange(t)[None, None, None] < lengths[:, None, None, None]
    ref = np.asarray(dot_product_attention(q, k, v, mask=causal & keymask))
    valid_rows = np.asarray(keymask)[:, 0, 0, :]
    worst = 0.0
    for bi in range(b):
        worst = max(worst, float(np.abs(out[bi, :, valid_rows[bi]] - ref[bi, :, valid_rows[bi]]).max()))
    print(f"masked+causal clamp on-chip: max |delta| vs XLA = {worst:.2e}")
    assert worst < 8e-3, "clamp diverges on hardware"
    print("OK")


if __name__ == "__main__":
    main()
