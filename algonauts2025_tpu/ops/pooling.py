"""Temporal pooling as precomputed matrices (static shapes for XLA).

The reference pools ~298 2 Hz steps onto 100 TRs with
``nn.AdaptiveAvgPool1d`` (reference algonauts2025/model.py:60,120).  Its
uneven bin edges matter for Pearson parity, so we reproduce PyTorch's exact
binning — bin i averages input[floor(i*T/O) : ceil((i+1)*T/O)] — but as a
fixed (T, O) matrix so the op is a single MXU matmul under jit instead of
a gather/scatter.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["adaptive_avg_pool_matrix", "adaptive_avg_pool1d"]


@functools.lru_cache(maxsize=64)
def adaptive_avg_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) float32 matrix M with x @ M == AdaptiveAvgPool1d(n_out)(x)."""
    mat = np.zeros((n_in, n_out), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil
        mat[lo:hi, i] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool1d(x, n_out: int):
    """Pool the last axis of x to n_out bins (PyTorch semantics).

    Works on NumPy or JAX arrays; under jit the matrix is a constant folded
    into a single matmul.
    """
    n_in = x.shape[-1]
    mat = adaptive_avg_pool_matrix(n_in, n_out)
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return x @ jnp.asarray(mat)
    return x @ mat
