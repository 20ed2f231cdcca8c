"""Llama-3.x decoder backbone (flax.linen) for frozen text-feature extraction.

The reference runs HF ``meta-llama/Llama-3.2-3B`` in torch and stacks all
hidden layers (reference features/text.py:161-183, 226-256).  This is a
TPU-native reimplementation: GQA attention with llama3-scaled RoPE, RMSNorm,
SwiGLU MLP, returning the full (L+1, B, T, D) hidden-state stack under one
jit.  Weights convert from the HF checkpoint with ``params_from_hf``.

Numerics: bf16 activations with fp32 RMSNorm/softmax accumulation — the
standard TPU recipe for frozen inference.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LlamaConfig", "LlamaBackbone", "params_from_hf", "LLAMA_3P2_3B"]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    # llama3 rope scaling (3.2 family)
    rope_scaling_factor: float = 32.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    dtype: tp.Any = jnp.bfloat16


LLAMA_3P2_3B = LlamaConfig()


def _llama3_rope_freqs(cfg: LlamaConfig) -> np.ndarray:
    """Inverse frequencies with the llama3 long-context rescaling."""
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
    )
    if cfg.rope_scaling_factor and cfg.rope_scaling_factor != 1.0:
        low_wavelen = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high_wavelen = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = inv_freq / cfg.rope_scaling_factor
        smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(
            wavelen > low_wavelen,
            scaled,
            np.where(wavelen < high_wavelen, inv_freq, smoothed),
        )
    return inv_freq.astype(np.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32**2, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + self.eps)
        return (out * w).astype(x.dtype)


class LlamaMlp(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda features, name: nn.Dense(
            features, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.dtype, name=name
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


def _decoder_attention(q, k, v, mask, lengths, hd, dtype):
    """Causal decoder attention: blockwise flash on TPU (right-padded
    lengths masked in-kernel), XLA einsum elsewhere."""
    t = q.shape[-2]
    if (
        jax.default_backend() == "tpu"
        and lengths is not None
        and t >= 256
        and t % 128 == 0
    ):
        from ...ops.flash_attention import flash_attention

        qb = 256 if t % 256 == 0 else 128
        kvb = 512 if t % 512 == 0 else qb
        return flash_attention(
            q, k, v, q_block=qb, kv_block=kvb, causal=True, lengths=lengths
        )
    # shared XLA fallback (dtype: probs cast to v.dtype == cfg.dtype);
    # fully-masked rows zero-fill, matching the flash kernel
    del hd, dtype
    from ...ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, mask=mask)


class LlamaLayer(nn.Module):
    """One decoder layer; scan-compatible (carry=(x, cos, sin, mask, lengths))."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, carry, _unused):
        x, cos, sin, mask, lengths = carry
        cfg = self.cfg
        h = RMSNorm(cfg.rms_eps, name="input_norm")(x)
        x = x + LlamaAttention(cfg, name="attn")(h, cos, sin, mask, lengths)
        h = RMSNorm(cfg.rms_eps, name="post_norm")(x)
        x = x + LlamaMlp(cfg, name="mlp")(h)
        # emit the per-layer hidden state (fp32) for the (L+1) stack
        return (x, cos, sin, mask, lengths), x.astype(jnp.float32)


def attention_inputs(cfg: "LlamaConfig", attention_mask: jax.Array):
    """Layer-invariant attention inputs from a padding mask.

    Returns ``(cos, sin, mask, lengths, right_padded)``: the per-batch
    llama3 RoPE tables for cumsum-derived positions, the causal+pad
    (B, 1, T, T) mask, per-row token counts, and the right-pad-contract
    validity flag per row.  Shared by :class:`LlamaBackbone` and the
    pipeline-parallel path (parallel/pipeline.py) so the preamble cannot
    drift between them.
    """
    t = attention_mask.shape[-1]
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    pad = attention_mask[:, None, None, :].astype(bool)
    mask = causal & pad

    # per-batch positions -> per-batch cos/sin
    inv = jnp.asarray(_llama3_rope_freqs(cfg))
    ang = positions[..., None].astype(jnp.float32) * inv  # (B, T, hd/2)
    emb = jnp.concatenate([ang, ang], axis=-1)  # (B, T, hd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
    right_padded = jnp.all(
        attention_mask.astype(bool) == (jnp.arange(t)[None] < lengths[:, None]),
        axis=-1,
    )
    return cos, sin, mask, lengths, right_padded


class LlamaBackbone(nn.Module):
    """Frozen decoder; returns all hidden states (L+1, B, T, D).

    Layers run under nn.scan with stacked (L, ...) params: one compiled
    layer body regardless of depth (compile latency matters at 3B scale).

    ``attention_mask`` must be RIGHT-padded (1s then 0s); rows violating
    the contract return NaN states on every backend (the TPU flash path
    could not honor them and a silent CPU/TPU divergence is worse).
    """

    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: jax.Array | None = None
    ) -> jax.Array:
        cfg = self.cfg
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        embed = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.dtype,  # frozen backbone: store weights in bf16
            name="embed_tokens",
        )
        x = embed(input_ids)
        cos, sin, mask, lengths, right_padded = attention_inputs(cfg, attention_mask)

        ScannedLayer = nn.scan(
            LlamaLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )
        # CONTRACT: masks are right-padded (all callers pad via _pad_ids).
        # The TPU flash path masks columns >= lengths, which is only correct
        # for right padding; rather than let a left-padded mask silently
        # attend to pad tokens on TPU while the XLA fallback stays correct,
        # poison violating rows with NaN on every backend.
        x = jnp.where(right_padded[:, None, None], x, jnp.nan)
        (x, _, _, _, _), layer_states = ScannedLayer(cfg, name="layers")(
            (x, cos, sin, mask, lengths), None
        )
        x = RMSNorm(cfg.rms_eps, name="final_norm")(x)
        # HF parity: [embeddings, layer_1..layer_{L-1}, final_norm(layer_L)]
        head = embed(input_ids).astype(jnp.float32)[None]
        full = jnp.concatenate([head, layer_states], axis=0)
        full = full.at[-1].set(x.astype(jnp.float32))
        return full


class LlamaAttention(nn.Module):
    """GQA attention with per-batch llama3 RoPE tables (padding tolerant)."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask, lengths=None):
        cfg = self.cfg
        b, t, _ = x.shape
        hd = cfg.head_dim
        dense = lambda features, name: nn.Dense(
            features, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.dtype, name=name
        )
        q = dense(cfg.num_heads * hd, "q_proj")(x)
        k = dense(cfg.num_kv_heads * hd, "k_proj")(x)
        v = dense(cfg.num_kv_heads * hd, "v_proj")(x)
        q = q.reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)

        def rope(z):
            return (
                z.astype(jnp.float32) * cos[:, None] + _rotate_half(z.astype(jnp.float32)) * sin[:, None]
            ).astype(cfg.dtype)

        q, k = rope(q), rope(k)
        rep = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        out = _decoder_attention(q, k, v, mask, lengths, hd, cfg.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * hd)
        return dense(cfg.hidden_size, "o_proj")(out)


def params_from_hf(
    state_dict: tp.Mapping[str, tp.Any],
    cfg: LlamaConfig,
    *,
    on_host: bool = False,
) -> dict:
    """Convert an HF LlamaModel state dict to this module's param pytree.

    Per-layer weights are stacked along a leading (num_layers,) axis to
    match the scanned layer stack.  ``on_host=True`` keeps the tree as
    NumPy (ml_dtypes bf16) instead of device arrays — required when the
    tree is about to be device_put with a SHARDING (pipeline stages): a
    device conversion would materialize the full stack on device 0
    first, which is exactly the OOM the sharding exists to avoid.
    """

    def arr(name, transpose=False, dtype=None):
        w = state_dict[name]
        w = np.asarray(w.to(dtype=_torch_f32()) if hasattr(w, "to") else w, dtype=np.float32)
        if transpose:
            w = w.T
        target = dtype or cfg.dtype
        if on_host:
            return np.asarray(w).astype(np.dtype(target))
        return jnp.asarray(w, dtype=target)

    def stacked(fmt, transpose=False, dtype=None):
        parts = [
            arr(fmt.format(i=i), transpose=transpose, dtype=dtype)
            for i in range(cfg.num_layers)
        ]
        return np.stack(parts) if on_host else jnp.stack(parts)

    layers: dict[str, tp.Any] = {
        "input_norm": {
            "weight": stacked("layers.{i}.input_layernorm.weight", dtype=jnp.float32)
        },
        "post_norm": {
            "weight": stacked(
                "layers.{i}.post_attention_layernorm.weight", dtype=jnp.float32
            )
        },
        "attn": {
            n: {"kernel": stacked(f"layers.{{i}}.self_attn.{n}.weight", transpose=True)}
            for n in ["q_proj", "k_proj", "v_proj", "o_proj"]
        },
        "mlp": {
            n: {"kernel": stacked(f"layers.{{i}}.mlp.{n}.weight", transpose=True)}
            for n in ["gate_proj", "up_proj", "down_proj"]
        },
    }
    return {
        "embed_tokens": {"embedding": arr("embed_tokens.weight")},
        "final_norm": {"weight": arr("norm.weight", dtype=jnp.float32)},
        "layers": layers,
    }


def _torch_f32():
    import torch

    return torch.float32
