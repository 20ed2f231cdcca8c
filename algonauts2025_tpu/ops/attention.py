"""Fused attention for the trunk: Pallas TPU kernel + XLA fallback.

Trunk sequences are short (~298 steps of pooled 2 Hz features, padded to a
static length), so the whole (T, T) score block fits in VMEM.  The Pallas
kernel fuses QK^T -> softmax -> PV per (batch, head) with no HBM round
trip for the scores — the speed-of-light plan for short sequences, vs. a
blockwise flash scheme which only pays off at much longer T.  Rotary
embedding (x_transformers-style partial rotary, reference
modeling_utils/models/transformer.py:36 rotary_pos_emb=True) is provided
as a separate fused-friendly op that XLA folds into the surrounding
matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._util import round_up as _round_up

__all__ = ["apply_rotary", "rotary_angles", "dot_product_attention", "fused_attention"]


def rotary_angles(seq_len: int, rot_dim: int, base: float = 10000.0) -> np.ndarray:
    """(seq_len, rot_dim/2) rotation angles (host-side constant)."""
    inv_freq = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    t = np.arange(seq_len)
    return np.einsum("t,f->tf", t, inv_freq).astype(np.float32)


def apply_rotary(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate the leading ``2*angles.shape[-1]`` dims of the head axis.

    x: (..., T, Dh); pairs are (x[2i], x[2i+1]) — the interleaved (GPT-J)
    convention — on the first rot_dim dims, the remainder passes through.
    x_transformers uses the half-split pairing (x[i], x[i+rot/2]) with the
    same angles; for a trunk trained from scratch the two are equivalent up
    to a fixed permutation of the learned q/k feature basis, proven exactly
    by tests/test_trunk_oracle.py's permuted weight-transfer parity.
    """
    rot_dim = 2 * angles.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    y1 = x1 * cos - x2 * sin
    y2 = x1 * sin + x2 * cos
    y = jnp.stack([y1, y2], axis=-1).reshape(x_rot.shape)
    # preserve the input dtype: the fp32 cos/sin multiply would silently
    # promote bf16 q/k, doubling VMEM footprints downstream
    return jnp.concatenate([y, x_pass], axis=-1).astype(x.dtype)


def dot_product_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """(B, H, T, Dh) attention, fp32 softmax accumulation.

    A fully-masked row returns ZEROS (matching the flash kernel's
    zero-fill for valid==0 rows) — softmax alone would emit the uniform
    mean of V including pad garbage, making TPU and CPU backends produce
    different features for the same input."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    if mask is not None:
        any_valid = jnp.any(mask, axis=-1, keepdims=True)  # (..., q, 1)
        out = jnp.where(any_valid, out, 0)
    return out


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    """Full-sequence fused attention for one (batch*head) slice in VMEM."""
    q = q_ref[0]  # (Tp, Dh)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    tp = scores.shape[-1]
    if valid_len < tp:  # mask padded kv columns
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_len, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@jax.custom_vjp
def _pallas_attention(q, k, v):
    """Pallas forward with an analytic XLA backward (the kernel itself has
    no autodiff rule; the trunk trains through this op)."""
    return _fused_attention_tpu(q, k, v)


def _pallas_attention_fwd(q, k, v):
    return _fused_attention_tpu(q, k, v), (q, k, v)


def _pallas_attention_bwd(res, g):
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g32)
    dprobs = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", dscores, k.astype(jnp.float32))
    dk = scale * jnp.einsum("bhqk,bhqd->bhkd", dscores, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_tpu(q, k, v, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, dh = q.shape
    tp = _round_up(t, 128)
    dp = _round_up(dh, 128)
    pad = [(0, 0), (0, 0), (0, tp - t), (0, dp - dh)]
    qp = jnp.pad(q, pad).reshape(b * h, tp, dp)
    kp = jnp.pad(k, pad).reshape(b * h, tp, dp)
    vp = jnp.pad(v, pad).reshape(b * h, tp, dp)

    spec = pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=dh**-0.5, valid_len=t),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tp * tp * dp,
            bytes_accessed=4 * b * h * tp * dp * 4,
            transcendentals=b * h * tp * tp,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, tp, dp)[:, :, :t, :dh]


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    force_pallas: bool | None = None,
) -> jax.Array:
    """Attention over (B, H, T, Dh); Pallas on TPU, XLA elsewhere.

    The Pallas path keeps the whole sequence per (b, h) in VMEM; it
    requires no mask (trunk windows are fixed-length).  Any masked call
    routes to the XLA path.
    """
    import os

    if force_pallas and mask is not None:
        # silently dropping the mask would attend to masked positions;
        # the Pallas kernel has no mask input by design
        raise ValueError(
            "force_pallas=True is incompatible with a mask; the full-VMEM "
            "kernel serves fixed-length unmasked windows only"
        )
    use_pallas = force_pallas
    if use_pallas is None and os.environ.get("ALGONAUTS_TPU_NO_PALLAS"):
        # debug escape hatch; an EXPLICIT force_pallas=True wins over the
        # env var (tests that exercise the kernel must not silently pass
        # on the XLA path).  Read at trace time: toggling after the first
        # compile has no effect on cached executables.
        use_pallas = False
    if use_pallas is None:
        t, dh = q.shape[-2], q.shape[-1]
        vmem_bytes = (_round_up(t, 128) ** 2 + 4 * _round_up(t, 128) * _round_up(dh, 128)) * 4
        use_pallas = (
            mask is None
            and jax.default_backend() == "tpu"
            and vmem_bytes < 12 * 1024 * 1024
        )
    if use_pallas:
        return _pallas_attention(q, k, v)
    return dot_product_attention(q, k, v, mask)
