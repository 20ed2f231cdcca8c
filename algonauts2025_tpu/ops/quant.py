"""int8 matmul path for frozen-backbone inference (v5e native int8 MXU).

w8a8 symmetric quantization: weights per-output-channel, activations
per-row (dynamic).  The int8 MXU nominally runs at 2x the bf16 rate on
v5e, and an isolated matmul measures 1.26x — but IN-GRAPH at ViT-G shapes
the dynamic activation quantization (per-row max/round/cast: ~4 extra
memory-bound passes) offsets the MXU gain entirely: 378 ms/window vs 371
exact (measured r2).  The subsystem stays as the substrate for
weight-only or fused-quant variants; the `quantize` flag on the video
feature is OFF by default and part of the cache identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_weight",
    "int8_matmul",
    "QuantDense",
    "calibrate_quant_scales",
]


def quantize_weight(w: np.ndarray | jax.Array) -> tuple[jax.Array, jax.Array]:
    """(K, N) float weights -> (int8 (K, N), fp32 per-column scale (N,))."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array | None = None,
) -> jax.Array:
    """x (..., K) float @ int8 (K, N); accumulates int32 on the MXU.

    ``x_scale=None``: dynamic per-row activation scales (an extra
    memory-bound max pass over x — measured to eat most of the int8 MXU
    gain at ViT-G shapes).  ``x_scale`` scalar: static, calibrated offline
    for frozen backbones; the quantize cast fuses into the producer and
    the matmul chain runs at 1.44x the bf16 rate (scripts/bench_int8.py:
    191 vs 133 TF/s equivalent).
    """
    lead = x.shape[:-1]
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if x_scale is None:
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
    else:
        sx = jnp.maximum(jnp.asarray(x_scale, jnp.float32), 1e-12)
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * sx * w_scale[None]
    return out.reshape(lead + (w_q.shape[-1],))


class QuantDense:
    """Functional int8 dense over pre-quantized params.

    Not a flax module: frozen backbones pass params explicitly, so the
    quantized kernel/scale/bias ride the same param pytree (converted once
    by ``quantize_params``)."""

    @staticmethod
    def apply(params: dict, x: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
        y = int8_matmul(x, params["kernel_q"], params["scale"])
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(out_dtype)


_DENSE_NAMES = ("query", "key", "value", "proj", "fc1", "fc2")


def quantize_tree(params: dict, names: tuple[str, ...] = _DENSE_NAMES) -> dict:
    """Quantize every named dense sub-dict of a float param pytree (the
    conversion path for an already-loaded float backbone)."""

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and k in names and "kernel" in v:
                out[k] = quantize_dense_params(v)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


def quantize_dense_params(dense_params: dict) -> dict:
    """{'kernel','bias'?} float tree -> {'kernel_q','scale','bias'?}.

    Works on stacked (L, K, N) scan params too (per-layer scales)."""
    kernel = jnp.asarray(dense_params["kernel"], jnp.float32)
    if kernel.ndim == 3:  # (L, K, N): quantize each layer independently
        w_q, scale = jax.vmap(quantize_weight)(kernel)
        a_scale = jnp.zeros((kernel.shape[0],), jnp.float32)
    else:
        w_q, scale = quantize_weight(kernel)
        a_scale = jnp.zeros((), jnp.float32)
    # 0 = uncalibrated; static-scale mode requires calibrate_quant_scales
    out = {"kernel_q": w_q, "scale": scale, "a_scale": a_scale}
    if "bias" in dense_params:
        out["bias"] = jnp.asarray(dense_params["bias"], jnp.float32)
    return out


def calibrate_quant_scales(apply_fn, params: dict, *inputs, margin: float = 1.0) -> dict:
    """Set static activation scales from one observed forward pass.

    Runs ``apply_fn({"params": params}, *inputs, mutable=["quant_stats"])``
    — every ``_QDense`` sows its input absmax into ``quant_stats`` (max-
    reduced over calls; stacked (L,) under nn.scan) — then returns params
    with each ``a_scale`` set to ``absmax * margin / 127``.  Frozen
    backbones have stationary activation statistics, so one representative
    batch suffices; pass ``margin > 1`` for clip headroom on unseen data.
    """
    mutated = jax.jit(
        lambda p, *xs: apply_fn({"params": p}, *xs, mutable=["quant_stats"])[1]
    )(params, *inputs)
    stats = mutated.get("quant_stats", {})

    def walk(p_node, s_node):
        out = {}
        for key, val in p_node.items():
            if isinstance(val, dict):
                out[key] = walk(val, s_node.get(key, {}) if isinstance(s_node, dict) else {})
            elif key == "a_scale":
                absmax = s_node.get("absmax") if isinstance(s_node, dict) else None
                if absmax is None:
                    out[key] = val
                else:
                    if isinstance(absmax, (tuple, list)):
                        absmax = absmax[0]
                    out[key] = jnp.maximum(
                        jnp.asarray(absmax, jnp.float32) * margin / 127.0, 1e-12
                    )
            else:
                out[key] = val
        return out

    return walk(params, stats)
