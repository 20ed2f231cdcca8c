"""Residual-MLP fMRI decoder (alternate model family).

Rebuild of reference modeling_utils/models/fmri_mlp.py:20-199: subject
layers, optional TR embeddings, a grouped per-TR input layer, residual
hidden blocks and in/out time aggregation.  The grouped conv of the
reference is expressed as a per-TR batched matmul (einsum), which XLA maps
onto the MXU directly.
"""

from __future__ import annotations

from typing import Dict, Literal, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import pydantic

from ..ops.fast_gelu import gelu_fast
from .common import MlpConfig, SubjectLayers

_TimeAgg = Literal["in_mean", "in_linear", "out_mean", "out_linear"]


class FmriMlpConfig(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="forbid")
    name: Literal["FmriMlp"] = "FmriMlp"

    # trunk
    hidden: int = 4096
    n_blocks: int = 4
    act_first: bool = False
    norm_type: str = "ln"

    # temporal handling
    time_agg: _TimeAgg = "out_linear"
    n_repetition_times: int = 1
    use_tr_layer: bool = False
    use_tr_embeds: bool = False
    tr_embed_dim: int = 16

    # subject conditioning
    subject_layers: bool = False
    subject_layers_dim: Literal["input", "hidden"] = "hidden"
    subject_layers_id: bool = False
    n_subjects: int = 20

    # outputs
    out_dim: Optional[int] = None
    output_head_config: Union[MlpConfig, Dict[str, MlpConfig], None] = None

    def build(self, n_in_channels: int, n_outputs: Optional[int]) -> "FmriMlp":
        width = n_outputs if n_outputs is not None else self.out_dim
        if width is None:
            raise ValueError("set either n_outputs or config.out_dim")
        return FmriMlp(in_dim=n_in_channels, out_dim=width, config=self)


class _ActNorm(nn.Module):
    norm_type: str
    act_first: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # BatchNorm-free design: only "ln" is supported (stateless under
        # jit; batch statistics are hostile to SPMD training).  The
        # reference's norm_type="bn" (BatchNorm1d+relu, fmri_mlp.py:84-87)
        # must fail loudly rather than silently train LayerNorm instead —
        # same convention as models/common.py Mlp.
        if self.norm_type != "ln":
            raise NotImplementedError(
                f"norm_type={self.norm_type!r}: only 'ln' is supported "
                "(BatchNorm is stateful and SPMD-hostile; the reference's "
                "'bn' variant is deliberately not replicated)"
            )
        # erf-form gelu: torch nn.GELU default (reference fmri_mlp.py:87);
        # the flax default approximate=True diverges ~1e-3 per layer.  The
        # rational gelu_fast is exact to 1.3e-6 at ~half the VPU ops
        act = gelu_fast
        if self.act_first:
            return nn.LayerNorm()(act(x))
        return act(nn.LayerNorm()(x))


class FmriMlp(nn.Module):
    in_dim: int
    out_dim: int
    config: FmriMlpConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        training: bool = False,
    ) -> jax.Array:
        cfg = self.config
        x = jnp.reshape(x, (x.shape[0], -1, x.shape[-1]))  # (B, C, T)
        n_rep = cfg.n_repetition_times

        if cfg.time_agg == "in_mean":
            x = x.mean(axis=2, keepdims=True)
            n_rep = 1
        elif cfg.time_agg == "in_linear":
            x = nn.Dense(1)(x)  # Dense over the trailing time axis -> (B, C, 1)
            n_rep = 1
        b, _, t = x.shape
        assert t == n_rep, f"TR mismatch: {t} != {n_rep}"

        if cfg.subject_layers:
            dim = {"hidden": cfg.hidden, "input": self.in_dim}[cfg.subject_layers_dim]
            x = SubjectLayers(
                in_channels=self.in_dim,
                out_channels=dim,
                n_subjects=cfg.n_subjects,
                init_id=cfg.subject_layers_id,
                use_bias=False,
            )(x, subject_ids)

        x = jnp.swapaxes(x, 1, 2)  # (B, T, C)

        if cfg.use_tr_embeds:
            embeds = nn.Embed(n_rep, cfg.tr_embed_dim)(jnp.arange(t))
            embeds = jnp.broadcast_to(embeds[None], (b, t, cfg.tr_embed_dim))
            x = jnp.concatenate([x, embeds], axis=2)

        if cfg.use_tr_layer:
            # per-TR weights: the reference's grouped conv1d == one matmul
            # per TR -> a single (T, C, H) einsum on the MXU
            w = self.param(
                "tr_weights",
                nn.initializers.lecun_normal(),
                (t, x.shape[-1], cfg.hidden),
            )
            bias = self.param("tr_bias", nn.initializers.zeros, (t, cfg.hidden))
            x = jnp.einsum("btc,tch->bth", x, w) + bias[None]
        else:
            x = nn.Dense(cfg.hidden)(x)

        x = _ActNorm(cfg.norm_type, cfg.act_first)(x)
        x = nn.Dropout(0.5)(x, deterministic=not training)

        residual = x
        for _ in range(cfg.n_blocks):
            h = nn.Dense(cfg.hidden)(x)
            h = _ActNorm(cfg.norm_type, cfg.act_first)(h)
            h = nn.Dropout(0.15)(h, deterministic=not training)
            x = h + residual
            residual = x

        x = jnp.swapaxes(x, 1, 2)  # (B, H, T)
        if cfg.time_agg == "out_mean":
            x = x.mean(axis=2)
        elif cfg.time_agg == "out_linear":
            x = nn.Dense(1)(x)[..., 0]
        x = x.reshape(b, -1)
        x = nn.Dense(self.out_dim)(x)

        if cfg.output_head_config is not None:
            if isinstance(cfg.output_head_config, MlpConfig):
                x = cfg.output_head_config.build()(x)
            else:
                return {
                    name: head_cfg.build()(x)
                    for name, head_cfg in cfg.output_head_config.items()
                }
        return x
