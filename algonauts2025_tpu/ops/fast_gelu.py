"""Branch-free rational erf-gelu for the TPU VPU.

XLA's native f32 erf lowers to a two-branch select (|x| < 1 polynomial,
else an erfc path with exp and a reciprocal) — on SIMD hardware both
branches execute, so exact-form gelu costs ~30 VPU ops per element.  Under
full rematerialization the trunk pays that three times per training step
(forward + recompute + backward), which is where the r3 0.383 -> 0.430
s/step regression came from (BENCH_NOTES r3 training accounting).

This module evaluates erf as a single clamped odd rational

    erf(z) ~= z * P5(z^2) / Q4(z^2)   for |z| <= 3.5, clamped outside

fit by iteratively-reweighted least squares toward minimax on [0, 3.5]
(coefficients below; the clamp is exact to 7.4e-7 because erf saturates).
Measured in f32 evaluation order: max |erf error| 7.2e-7 over the reals,
max |gelu error| 1.3e-6 for |x| < 5 — ~15x below the trunk-oracle atol
(tests/test_trunk_oracle.py, 2e-5) and ~3 decades below bf16 resolution.
No exp, no branch, one divide: ~16 VPU ops per gelu including the wrap.

Autodiff goes straight through the rational (its derivative is again a
small rational), so the backward pass sees the same op-count savings —
unlike exact erf, whose gradient needs exp(-x^2/2).

The reference trains with torch nn.GELU() exact erf (x_transformers FF,
reference models/transformer.py:43-61); parity is gated by the torch
oracle and the golden e2e pin, both of which hold at these error bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["erf_rational", "gelu_fast"]

# P/Q coefficients for erf(z)/z as a rational in u = z^2 on [0, 3.5^2],
# IRLS-minimax fit (scripts in tests/test_fast_gelu.py re-derive bounds).
_P = (
    1.12837844e00,
    3.23145577e-01,
    6.63509064e-02,
    8.59716620e-03,
    2.27834428e-04,
    -1.41600601e-06,
)
_Q = (
    1.0,
    6.19700850e-01,
    1.65423640e-01,
    2.45017900e-02,
    2.04720000e-03,
)
_CLAMP = 3.5


def erf_rational(z: jax.Array) -> jax.Array:
    """erf(z) to 7.2e-7 absolute, branch-free (computed in the input dtype)."""
    zc = jnp.clip(z, -_CLAMP, _CLAMP)
    u = zc * zc
    p = jnp.asarray(_P[-1], z.dtype)
    for c in _P[-2::-1]:
        p = p * u + jnp.asarray(c, z.dtype)
    q = jnp.asarray(_Q[-1], z.dtype)
    for c in _Q[-2::-1]:
        q = q * u + jnp.asarray(c, z.dtype)
    return zc * (p / q)


def gelu_fast(x: jax.Array) -> jax.Array:
    """Exact-form (erf) gelu to 1.3e-6 absolute; drop-in for
    nn.gelu(x, approximate=False) on training paths."""
    z = x * jnp.asarray(0.7071067811865476, x.dtype)
    half = jnp.asarray(0.5, x.dtype)
    one = jnp.asarray(1.0, x.dtype)
    return half * x * (one + erf_rational(z))
