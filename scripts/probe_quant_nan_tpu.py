"""Real-chip check that uncalibrated-scale NaN poisoning survives Mosaic.

The ops/quant kernels poison outputs with NaN when a static activation
scale is 0 (the uncalibrated sentinel).  tests/test_quant.py verifies the
semantics in Pallas interpret mode; this probe confirms the compiled
Mosaic kernels propagate the NaN identically on hardware (conceivable
divergence: flush/denormal handling in the MXU dequant path).

Run whenever a chip is attached: python scripts/probe_quant_nan_tpu.py
(written r3b while the axon tunnel was down — not yet executed on silicon).
"""
import sys

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np

from algonauts2025_tpu.ops.quant import (
    int8_matmul_fused,
    int8_mlp_fused,
    quantize_weight,
)


def main() -> None:
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    m, k, n = 128, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16)
    w_q, w_scale = quantize_weight(rng.standard_normal((k, n)).astype(np.float32))
    zero = jnp.float32(0.0)
    good = jnp.float32(np.abs(np.asarray(x, np.float32)).max() / 127.0)

    out = np.asarray(int8_matmul_fused(x, w_q, w_scale, zero, out_dtype=jnp.float32))
    ok1 = np.isnan(out).all()
    print(f"fused matmul zero-scale all-NaN: {ok1}")

    w2q, s2 = quantize_weight(rng.standard_normal((n, k)).astype(np.float32))
    b1 = jnp.zeros((n,), jnp.float32)
    b2 = jnp.zeros((k,), jnp.float32)
    ok2 = True
    for sx, sh, tag in [(zero, good, "sx=0"), (good, zero, "sh=0")]:
        o = np.asarray(
            int8_mlp_fused(
                x, w_q, w_scale, b1, w2q, s2, b2, sx, sh,
                bm=128, fchunk=128, out_dtype=jnp.float32,
            )
        )
        all_nan = np.isnan(o).all()
        ok2 &= all_nan
        print(f"fused MLP {tag} all-NaN: {all_nan}")

    o = np.asarray(int8_matmul_fused(x, w_q, w_scale, good, out_dtype=jnp.float32))
    ok3 = np.isfinite(o).all()
    print(f"calibrated path finite: {ok3}")
    assert ok1 and ok2 and ok3, "NaN poisoning does not survive Mosaic — see ops/quant.py _static_scale"


if __name__ == "__main__":
    main()
