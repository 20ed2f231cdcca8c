"""Bounds for the rational erf-gelu (ops/fast_gelu.py).

The trunk FF and FmriMlp activation route through gelu_fast; these tests
pin its agreement with exact erf gelu (torch nn.GELU semantics, reference
models/transformer.py:43-61 via x_transformers) well inside the trunk
oracle tolerance (2e-5) so the swap cannot move parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from algonauts2025_tpu.ops.fast_gelu import erf_rational, gelu_fast


def _gelu_exact(x):
    return 0.5 * x * (1.0 + scipy.special.erf(x / np.sqrt(2.0)))


def test_erf_rational_bound():
    z = np.linspace(-8.0, 8.0, 400_001).astype(np.float32)
    got = np.asarray(jax.jit(erf_rational)(jnp.asarray(z)), dtype=np.float64)
    err = np.abs(got - scipy.special.erf(z.astype(np.float64)))
    assert err.max() < 1.5e-6, err.max()  # clamp tail + f32 rounding


def test_gelu_fast_value_bound():
    x = np.linspace(-12.0, 12.0, 400_001).astype(np.float32)
    got = np.asarray(jax.jit(gelu_fast)(jnp.asarray(x)), dtype=np.float64)
    err = np.abs(got - _gelu_exact(x.astype(np.float64)))
    # ~7e-6 worst case at |x|=12 (clamp tail, linear in |x|); ~1.5e-6 for
    # |x| < 5 where post-norm activations actually live
    assert err.max() < 1e-5, err.max()
    inner = np.abs(x) < 5
    assert err[inner].max() < 2e-6


def test_gelu_fast_grad_matches_exact():
    x = np.linspace(-6.0, 6.0, 20_001).astype(np.float32)
    g_fast = np.asarray(
        jax.jit(jax.vmap(jax.grad(gelu_fast)))(jnp.asarray(x)), dtype=np.float64
    )
    xd = x.astype(np.float64)
    # d/dx gelu = Phi(x) + x phi(x)
    g_exact = 0.5 * (1 + scipy.special.erf(xd / np.sqrt(2))) + xd * np.exp(
        -0.5 * xd * xd
    ) / np.sqrt(2 * np.pi)
    assert np.abs(g_fast - g_exact).max() < 5e-5


def test_gelu_fast_bf16_matches_exact_bf16():
    # after a bf16 cast the two paths agree to within bf16 quantization +
    # the clamp-tail absolute error (~7e-6 — the deep-negative tail where
    # exact gelu is ~1e-11 and the clamp floor is ~3e-6 dominates the
    # RELATIVE error, but both are zero at activation scale)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4096,)).astype(np.float32) * 3
    fast16 = np.asarray(
        gelu_fast(jnp.asarray(x)).astype(jnp.bfloat16).astype(jnp.float32)
    )
    exact16 = np.asarray(
        jnp.asarray(_gelu_exact(x.astype(np.float64)), jnp.bfloat16).astype(
            jnp.float32
        )
    )
    np.testing.assert_allclose(fast16, exact16, atol=1e-5, rtol=0.008)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gelu_fast_dtype_preserved(dtype):
    x = jnp.ones((8,), dtype)
    assert gelu_fast(x).dtype == dtype
