"""Wav2Vec2-BERT conformer backbone (flax.linen) for frozen audio features.

The reference runs HF ``facebook/w2v-bert-2.0`` in torch (reference
features/audio.py:44-50, 253-263).  TPU-native reimplementation of the
inference path for ``position_embeddings_type="relative_key"`` (the
w2v-bert-2.0 setting): feature projection (LayerNorm + Linear over 160-dim
stacked log-mel frames) followed by conformer blocks — half-step FFNs,
self-attention with clamped relative-distance key bias, and a causal
depthwise-conv module.  Returns the (L+1, B, T, D) hidden-state stack.

Weight conversion from the HF checkpoint via ``params_from_hf``.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Wav2VecBertConfig", "Wav2VecBertBackbone", "params_from_hf", "W2V_BERT_2_0"]


@dataclasses.dataclass(frozen=True)
class Wav2VecBertConfig:
    input_dim: int = 160
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_kernel_size: int = 31
    left_max_pos: int = 64
    right_max_pos: int = 8
    layer_norm_eps: float = 1e-5
    dtype: tp.Any = jnp.bfloat16


W2V_BERT_2_0 = Wav2VecBertConfig()


class FeedForward(nn.Module):
    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, param_dtype=cfg.dtype, name="intermediate_dense")(x)
        x = nn.swish(x)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.dtype, name="output_dense")(x)


class ConvModule(nn.Module):
    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(self, x, pad_mask=None):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="layer_norm")(x)
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], h, 0.0)
        # pointwise conv 1 (-> 2*hidden) + GLU over channels
        h = nn.Dense(2 * cfg.hidden_size, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.dtype, name="pointwise_conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)
        # causal depthwise conv: pad (k-1) on the left of time
        k = cfg.conv_kernel_size
        h = jnp.pad(h, ((0, 0), (k - 1, 0), (0, 0)))
        h = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            feature_group_count=cfg.hidden_size,
            padding="VALID",
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=cfg.dtype,
            name="depthwise_conv",
        )(h)
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="depthwise_layer_norm"
        )(h)
        h = nn.swish(h)
        h = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.dtype, name="pointwise_conv2")(h)
        return h


class RelKeyAttention(nn.Module):
    """Self-attention with clamped relative-distance key bias
    (HF modeling_wav2vec2_bert.py:308-320)."""

    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(self, x, attn_bias=None, rel_m=None):
        cfg = self.cfg
        b, t, _ = x.shape
        h, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        dense = lambda name, features=cfg.hidden_size, bias=True: nn.Dense(
            features, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.dtype, name=name
        )
        q = dense("linear_q")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = dense("linear_k")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = dense("linear_v")(x).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / hd**0.5

        # relative key bias: distance clamped to [-left, right]
        n_pos = cfg.left_max_pos + cfg.right_max_pos + 1
        dist_emb = self.param(
            "distance_embedding",
            nn.initializers.normal(0.02),
            (n_pos, hd),
        )
        # project q onto the small distance table first (one MXU matmul),
        # then place the 73 clamped diagonals with a banded one-hot matmul
        # (rel_m is built once per forward and broadcast into the scan).
        # No (T, T, hd) positional tensor, no gather, and no flatten/shift
        # skew: the skew's lane-crossing reshapes dominated the whole
        # conformer on TPU (570 of 634 ms for 24 layers at T=1499).
        qd = jnp.einsum(
            "bhld,pd->bhlp",
            q.astype(jnp.float32),
            dist_emb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (B, H, T, n_pos)
        if rel_m is None:
            rel_m = _rel_onehot(t, cfg.left_max_pos, cfg.right_max_pos)
        # M is a bf16 one-hot (half the resident footprint).  On TPU,
        # splitting fp32 qd into hi + lo bf16 halves keeps the placement
        # exact to ~2^-17 (one nonzero product per half, fp32 accumulation,
        # hi + lo == qd) on native bf16 MXU passes.  Off-TPU, promote M:
        # the CPU dot runtime cannot execute bf16 x bf16 -> f32.
        dot = functools.partial(
            jnp.einsum, "bhlp,lpr->bhlr", preferred_element_type=jnp.float32
        )
        if jax.default_backend() == "tpu":
            qd_hi = qd.astype(jnp.bfloat16)
            qd_lo = (qd - qd_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rel = dot(qd_hi, rel_m) + dot(qd_lo, rel_m)
        else:
            rel = dot(qd, rel_m.astype(jnp.float32))
        scores = scores + rel / hd**0.5
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        return dense("linear_out")(out)


def _rel_onehot(t: int, left: int, right: int) -> jax.Array:
    """(T, P, T) banded one-hot: M[l, p, r] = (clamp(r-l, -left, right)+left == p).

    ``rel = einsum('bhlp,lpr->bhlr', qd, M)`` lays the clamped diagonals
    out with one batched MXU matmul (one nonzero per output element, so
    the result is exact).  This replaces a flatten/shift/reshape skew
    whose lane-crossing relayouts ran at ~12 GB/s and dominated the whole
    conformer on TPU (570 of 634 ms for 24 layers at T=1499 — measured by
    component ablation).  M is built on device from iotas, once per
    forward, and broadcast into the layer scan; fp32 so the bias keeps
    exact parity with a table lookup (reference
    modeling_wav2vec2_bert.py:308-320).
    """
    li = jax.lax.broadcasted_iota(jnp.int32, (t, 1, t), 0)
    pi = jax.lax.broadcasted_iota(jnp.int32, (t, left + right + 1, t), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (t, 1, t), 2)
    d = jnp.clip(ri - li, -left, right) + left
    # bf16 halves the resident footprint (0/1 are exact in bf16); at the
    # pipeline's 60 s chunk max (T=3000) fp32 M would pin 2.6 GB across
    # the whole scan, bf16 1.3 GB
    return (d == pi).astype(jnp.bfloat16)


class ConformerLayer(nn.Module):
    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(self, x, attn_bias=None, pad_mask=None, rel_m=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )
        x = x + 0.5 * FeedForward(cfg, name="ffn1")(ln("ffn1_layer_norm")(x))
        x = x + RelKeyAttention(cfg, name="self_attn")(
            ln("self_attn_layer_norm")(x), attn_bias, rel_m
        )
        x = x + ConvModule(cfg, name="conv_module")(x, pad_mask)
        x = x + 0.5 * FeedForward(cfg, name="ffn2")(ln("ffn2_layer_norm")(x))
        return ln("final_layer_norm")(x)


class ScannedConformerLayer(nn.Module):
    """scan wrapper: carry=(x, attn_bias, pad_mask, rel_m)."""

    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(self, carry, _unused):
        x, attn_bias, pad_mask, rel_m = carry
        x = ConformerLayer(self.cfg, name="layer")(x, attn_bias, pad_mask, rel_m)
        return (x, attn_bias, pad_mask, rel_m), x.astype(jnp.float32)


class Wav2VecBertBackbone(nn.Module):
    """Frozen conformer; returns all hidden states (L+1, B, T, D).

    Layers run under nn.scan with stacked (L, ...) params so XLA compiles
    one conformer block regardless of depth.
    """

    cfg: Wav2VecBertConfig

    @nn.compact
    def __call__(
        self, input_features: jax.Array, attention_mask: jax.Array | None = None
    ) -> jax.Array:
        cfg = self.cfg
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="fp_layer_norm"
        )(input_features)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=cfg.dtype, name="fp_projection")(x)
        b, t, _ = x.shape
        if attention_mask is not None:
            pad_mask = attention_mask.astype(bool)
            x = jnp.where(pad_mask[..., None], x, 0.0)
            attn_bias = jnp.where(pad_mask[:, None, None, :], 0.0, -1e30)
        else:
            # static all-ones mask keeps the scan carry structure uniform
            pad_mask = jnp.ones((b, t), bool)
            attn_bias = jnp.zeros((b, 1, 1, t))
        ScannedLayer = nn.scan(
            ScannedConformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )
        head = x.astype(jnp.float32)[None]
        rel_m = _rel_onehot(t, cfg.left_max_pos, cfg.right_max_pos)
        (x, _, _, _), layer_states = ScannedLayer(cfg, name="layers")(
            (x, attn_bias, pad_mask, rel_m), None
        )
        return jnp.concatenate([head, layer_states], axis=0)


def params_from_hf(
    state_dict: tp.Mapping[str, tp.Any], cfg: Wav2VecBertConfig
) -> dict:
    """Convert an HF Wav2Vec2BertModel state dict to this param pytree,
    stacking per-layer weights along a leading (num_layers,) axis."""

    def arr(name, transpose=False, dtype=None):
        w = state_dict[name]
        w = np.asarray(w.float() if hasattr(w, "float") else w, dtype=np.float32)
        if transpose:
            w = w.T
        return jnp.asarray(w, dtype=dtype)

    def linear(prefix, bias=True):
        out = {"kernel": arr(prefix + ".weight", transpose=True, dtype=cfg.dtype)}
        if bias:
            out["bias"] = arr(prefix + ".bias", dtype=cfg.dtype)
        return out

    def layernorm(prefix):
        return {"scale": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    def layer_params(i: int) -> dict:
        p = f"encoder.layers.{i}."
        layer: dict[str, tp.Any] = {}
        for ff in ["ffn1", "ffn2"]:
            layer[f"{ff}_layer_norm"] = layernorm(p + f"{ff}_layer_norm")
            layer[ff] = {
                "intermediate_dense": linear(p + f"{ff}.intermediate_dense"),
                "output_dense": linear(p + f"{ff}.output_dense"),
            }
        layer["self_attn_layer_norm"] = layernorm(p + "self_attn_layer_norm")
        attn = {
            name: linear(p + f"self_attn.{name}")
            for name in ["linear_q", "linear_k", "linear_v", "linear_out"]
        }
        attn["distance_embedding"] = arr(p + "self_attn.distance_embedding.weight")
        layer["self_attn"] = attn
        pw1 = arr(p + "conv_module.pointwise_conv1.weight")  # (2H, H, 1)
        pw2 = arr(p + "conv_module.pointwise_conv2.weight")  # (H, H, 1)
        dw = arr(p + "conv_module.depthwise_conv.weight")  # (H, 1, K)
        layer["conv_module"] = {
            "layer_norm": layernorm(p + "conv_module.layer_norm"),
            "depthwise_layer_norm": layernorm(p + "conv_module.depthwise_layer_norm"),
            "pointwise_conv1": {"kernel": pw1[:, :, 0].T},
            "pointwise_conv2": {"kernel": pw2[:, :, 0].T},
            "depthwise_conv": {"kernel": jnp.transpose(dw, (2, 1, 0))},
        }
        layer["final_layer_norm"] = layernorm(p + "final_layer_norm")
        return layer

    all_layers = [layer_params(i) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *all_layers)
    return {
        "fp_layer_norm": layernorm("feature_projection.layer_norm"),
        "fp_projection": linear("feature_projection.projection"),
        "layers": {"layer": stacked},
    }
