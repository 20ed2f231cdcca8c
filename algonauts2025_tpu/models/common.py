"""Shared model building blocks (flax.linen).

Rebuild of reference modeling_utils/models/common.py: the per-subject
linear readout (SubjectLayers), MLP factory config, LayerScale and Mean.

TPU note: SubjectLayers gathers one (C, D) weight slab per batch element.
With per-subject weights sharded over a ``model`` axis the einsum becomes
the standard tensor-parallel readout; subject gather is a cheap take on
the leading (subjects) axis.
"""

from __future__ import annotations

import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import pydantic


class SubjectLayers(nn.Module):
    """Per-subject linear map: x (B, C, T), subjects (B,) -> (B, D, T).

    Weight (S, C, D) init ~ N(0, 1/C) (reference common.py:26-42);
    ``average_subjects`` uses the mean weight for every element.
    """

    in_channels: int
    out_channels: int
    n_subjects: int
    use_bias: bool = True
    init_id: bool = False
    average_subjects: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, subjects: jax.Array | None) -> jax.Array:
        c, d, s = self.in_channels, self.out_channels, self.n_subjects
        scale = 1.0 / c**0.5
        if self.init_id:
            if c != d:
                raise ValueError("init_id requires in_channels == out_channels")

            def w_init(_key, _shape, _dtype=jnp.float32):
                return jnp.broadcast_to(jnp.eye(c)[None], (s, c, d)) * scale

            def b_init(_key, _shape, _dtype=jnp.float32):
                return jnp.zeros((s, d))

        else:

            def w_init(key, shape, dtype=jnp.float32):
                return jax.random.normal(key, shape, dtype) * scale

            def b_init(key, shape, dtype=jnp.float32):
                return jax.random.normal(key, shape, dtype) * scale

        weights = self.param("weights", w_init, (s, c, d))
        bias = self.param("bias", b_init, (s, d)) if self.use_bias else None

        if self.average_subjects or subjects is None:
            w = jnp.broadcast_to(weights.mean(axis=0)[None], (x.shape[0], c, d))
            b = None if bias is None else bias.mean(axis=0)[None, :, None]
        else:
            subjects = subjects.reshape(-1)
            w = jnp.take(weights, subjects, axis=0)  # (B, C, D)
            b = None if bias is None else jnp.take(bias, subjects, axis=0)[:, :, None]
        out = jnp.einsum("bct,bcd->bdt", x, w, preferred_element_type=jnp.float32)
        if b is not None:
            out = out + b
        return out.astype(x.dtype)


class Mean(nn.Module):
    """Axis-mean as a module (reference common.py:144-151; fmri_mlp time
    aggregation plugs it into sequential stacks)."""

    axis: int
    keepdims: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x.mean(axis=self.axis, keepdims=self.keepdims)


class LayerScale(nn.Module):
    """Learned per-channel residual scale with boosted init."""

    channels: int
    init: float = 0.1
    boost: float = 5.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            "scale",
            lambda _k, shape: jnp.full(shape, self.init / self.boost),
            (self.channels,),
        )
        return (self.boost * scale)[:, None] * x


class Mlp(nn.Module):
    """Linear stack with optional norm/activation/dropout per layer.

    Matches the reference MlpConfig semantics (common.py:120-141): no
    hidden sizes -> a bare Linear (no dropout); otherwise torchvision MLP
    layout — norm -> activation -> dropout after each hidden layer AND a
    trailing dropout after the final linear.
    """

    hidden_sizes: tp.Sequence[int]
    output_size: int | None = None
    norm_layer: str | None = None  # "layer" | None
    activation_layer: str | None = "relu"
    use_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        acts = {
            "gelu": nn.gelu,
            "relu": nn.relu,
            "elu": nn.elu,
            "prelu": None,  # module with a learned slope, built in the loop
            None: lambda v: v,
        }
        if self.activation_layer not in acts:
            raise ValueError(f"unknown activation_layer {self.activation_layer!r}")
        if self.norm_layer not in ("layer", None):
            # reference parity surface also names batch/instance norms;
            # those need mutable running stats the functional trainer does
            # not thread — fail loudly rather than silently training a
            # different architecture
            raise NotImplementedError(
                f"norm_layer={self.norm_layer!r} is not supported (use "
                "'layer' or None)"
            )
        sizes = list(self.hidden_sizes)
        if self.output_size is not None:
            sizes = sizes + [self.output_size]
        if not sizes:
            raise ValueError("Mlp needs hidden_sizes and/or output_size")
        for i, size in enumerate(sizes):
            x = nn.Dense(size, use_bias=self.use_bias)(x)
            if i < len(sizes) - 1:
                if self.norm_layer == "layer":
                    x = nn.LayerNorm()(x)
                if self.activation_layer == "prelu":
                    x = nn.PReLU()(x)  # learned slope, torch PReLU parity
                else:
                    x = acts[self.activation_layer](x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            elif self.hidden_sizes and self.dropout > 0:
                # torchvision MLP ends with Dropout after the final Linear;
                # the bare-Linear build (no hidden sizes) has none
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MlpConfig(pydantic.BaseModel):
    """Config surface mirroring the reference MlpConfig."""

    model_config = pydantic.ConfigDict(extra="forbid")
    name: tp.Literal["Mlp"] = "Mlp"
    input_size: int | None = None
    hidden_sizes: list[int] | None = None
    norm_layer: tp.Literal["layer", "batch", "instance", "unit", None] = None
    activation_layer: tp.Literal["relu", "gelu", "elu", "prelu", None] = "relu"
    bias: bool = True
    dropout: float = 0.0

    def build(self, input_size: int | None = None, output_size: int | None = None) -> Mlp:
        del input_size  # shapes are inferred at init time in flax
        return Mlp(
            hidden_sizes=self.hidden_sizes or [],
            output_size=output_size,
            norm_layer=self.norm_layer,
            activation_layer=self.activation_layer,
            use_bias=self.bias,
            dropout=self.dropout,
        )
