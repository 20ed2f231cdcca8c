"""Pearson correlation: batched, streaming (Welford), and as a loss.

The selection metric of the whole pipeline is mean per-voxel Pearson r
(reference main.py:221; metrics/base.py:26-29; metrics.py:16-63 streaming
variant).  Implemented as pure jittable functions over (N, D) arrays plus a
functional streaming state for epoch-level accumulation across devices
(state entries are summable, so a psum over the mesh merges shards).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

__all__ = [
    "pearson_corr",
    "PearsonState",
    "init_pearson_state",
    "update_pearson_state",
    "compute_pearson",
]


def pearson_corr(x: jax.Array, y: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-column Pearson r of two (N, D) arrays -> (D,).

    eps sits INSIDE the sqrt: d/dx sqrt(0) is inf, so the outside-eps form
    produces NaN gradients at constant columns (zero-padded voxels through
    zero-init heads) when this op is used as a loss (CLAUDE.md)."""
    xm = x - x.mean(axis=0, keepdims=True)
    ym = y - y.mean(axis=0, keepdims=True)
    cov = (xm * ym).sum(axis=0)
    xs = jnp.sqrt((xm**2).sum(axis=0) + eps)
    ys = jnp.sqrt((ym**2).sum(axis=0) + eps)
    return cov / (xs * ys + eps)


class PearsonState(tp.NamedTuple):
    """Sufficient statistics for streaming per-column Pearson r.

    All fields are sums, so cross-device reduction is a plain psum and
    merging batches is addition — no Welford merge formulas needed.
    """

    n: jax.Array  # scalar
    sx: jax.Array  # (D,) sum x
    sy: jax.Array  # (D,) sum y
    sxx: jax.Array  # (D,) sum x^2
    syy: jax.Array  # (D,) sum y^2
    sxy: jax.Array  # (D,) sum x*y


def init_pearson_state(dim: int, dtype=jnp.float32) -> PearsonState:
    z = jnp.zeros((dim,), dtype)
    return PearsonState(jnp.zeros((), dtype), z, z, z, z, z)


def update_pearson_state(
    state: PearsonState, preds: jax.Array, target: jax.Array
) -> PearsonState:
    """Accumulate a (N, D) batch of predictions/targets."""
    preds = preds.astype(state.sx.dtype)
    target = target.astype(state.sx.dtype)
    return PearsonState(
        n=state.n + preds.shape[0],
        sx=state.sx + preds.sum(0),
        sy=state.sy + target.sum(0),
        sxx=state.sxx + (preds**2).sum(0),
        syy=state.syy + (target**2).sum(0),
        sxy=state.sxy + (preds * target).sum(0),
    )


def compute_pearson(state: PearsonState, eps: float = 1e-8) -> jax.Array:
    """Per-column r from accumulated state -> (D,)."""
    n = state.n
    cov = state.sxy - state.sx * state.sy / n
    # fp32 cancellation can leave tiny-negative variances for near-constant
    # columns; clamp before the sqrt or the metric silently turns NaN
    vx = jnp.maximum(state.sxx - state.sx**2 / n, 0.0)
    vy = jnp.maximum(state.syy - state.sy**2 / n, 0.0)
    return cov / (jnp.sqrt(vx * vy) + eps)
