"""FmriEncoder: the flagship trimodal brain encoder (flax.linen).

Rebuild of reference algonauts2025/model.py: per-modality linear
projectors -> concat/sum to a 3072-d stream -> learned time positional
embedding (+ optional subject embedding) -> 8-layer rotary transformer ->
per-subject linear readout over parcels -> adaptive-average pooling onto
TRs.  Optional InfoNCE contrastive alignment against a stimulus modality.

TPU-first choices:
- batches are dicts of fixed-shape arrays; every branch (missing modality,
  modality dropout) is expressed with masks/zeros, never Python branching
  on traced values, so one executable serves the whole run;
- the TR pooler is a constant (T, T') matrix folded into a matmul;
- attention uses the fused Pallas kernel; bf16 activations optional with
  fp32 accumulation.
"""

from __future__ import annotations

import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import pydantic

from ..ops.pooling import adaptive_avg_pool_matrix
from .common import SubjectLayers
from .transformer import TransformerEncoder

HIDDEN_DIM = 3072
MAX_POSITIONS = 1024


class FmriEncoderConfig(pydantic.BaseModel):
    """Same config surface as the reference FmriEncoderConfig (model.py:20-43)."""

    model_config = pydantic.ConfigDict(extra="forbid")
    name: tp.Literal["FmriEncoder"] = "FmriEncoder"
    n_subjects: int | None = None
    feature_aggregation: tp.Literal["sum", "cat"] = "cat"
    layer_aggregation: tp.Literal["mean", "cat"] = "cat"
    subject_embedding: bool = False
    modality_dropout: float = 0.0

    contrastive_enabled: bool = False
    contrastive_modalities: list[str] = ["video"]
    contrastive_weight: float = 0.1
    contrastive_temperature: float = 0.07

    # TPU-specific knobs (absent in the reference)
    hidden: int = HIDDEN_DIM
    depth: int = 8
    heads: int = 8
    bf16: bool = False
    remat: bool = False
    #: with remat: selective checkpoint policy ("save_attn_out" saves the
    #: per-layer attention branch; None = full remat).  Numerically
    #: identical either way — a pure HBM-vs-recompute trade.
    remat_policy: str | None = None

    def build(
        self,
        feature_dims: dict[str, tuple[int, int] | None],
        n_outputs: int,
        n_output_timesteps: int,
    ) -> "FmriEncoder":
        return FmriEncoder(
            feature_dims={k: (tuple(v) if v else None) for k, v in feature_dims.items()},
            n_outputs=n_outputs,
            n_output_timesteps=n_output_timesteps,
            config=self,
        )


class FmriEncoder(nn.Module):
    feature_dims: tp.Mapping[str, tuple[int, int] | None]
    n_outputs: int
    n_output_timesteps: int
    config: FmriEncoderConfig

    def setup(self) -> None:
        cfg = self.config
        hidden = cfg.hidden
        n_mod = len(self.feature_dims)
        out_dim = hidden // n_mod if cfg.feature_aggregation == "cat" else hidden
        # the trunk width is the concatenated width (== hidden when hidden
        # divides n_mod, as in the reference's 3072/3)
        model_dim = out_dim * n_mod if cfg.feature_aggregation == "cat" else hidden
        if model_dim % cfg.heads:
            raise ValueError(
                f"trunk width {model_dim} (hidden={hidden}, {n_mod} modalities) "
                f"must be divisible by heads={cfg.heads}"
            )
        self.model_dim = model_dim
        projectors = {}
        contrastive_heads = {}
        for modality, tup in self.feature_dims.items():
            if tup is None:
                continue
            projectors[modality] = nn.Dense(out_dim, name=f"proj_{modality}")
            if cfg.contrastive_enabled and modality in cfg.contrastive_modalities:
                contrastive_heads[modality] = nn.Dense(
                    hidden, name=f"contrastive_{modality}"
                )
        self.projectors = projectors
        self.contrastive_heads = contrastive_heads
        self.time_pos_embed = self.param(
            "time_pos_embed",
            nn.initializers.normal(1.0),
            (1, MAX_POSITIONS, model_dim),
        )
        if cfg.subject_embedding:
            assert cfg.n_subjects is not None
            self.subject_embed = nn.Embed(cfg.n_subjects, model_dim)
        self.encoder = TransformerEncoder(
            dim=model_dim,
            depth=cfg.depth,
            heads=cfg.heads,
            attn_dropout=0.0,
            ff_dropout=0.0,
            remat=cfg.remat,
            remat_policy=cfg.remat_policy,
        )
        assert cfg.n_subjects is not None, "n_subjects must be set before build"
        self.predictor = SubjectLayers(
            in_channels=model_dim,
            out_channels=self.n_outputs,
            n_subjects=cfg.n_subjects,
            use_bias=True,
        )

    # -- pieces -----------------------------------------------------------
    def _prepare_modality(self, data: jax.Array) -> jax.Array:
        """(B, L, D, T) or (B, D, T) -> (B, T, D') with layer aggregation."""
        data = data.astype(jnp.float32)
        if data.ndim == 3:
            data = data[:, None]
        if self.config.layer_aggregation == "mean":
            data = data.mean(axis=1)  # (B, D, T)
        else:  # cat
            b, l, d, t = data.shape
            data = data.reshape(b, l * d, t)
        return jnp.swapaxes(data, 1, 2)  # (B, T, D')

    def aggregate_features(
        self, batch: tp.Mapping[str, jax.Array], training: bool = False
    ) -> jax.Array:
        cfg = self.config
        n_mod = len(self.feature_dims)
        names = list(self.feature_dims)
        ref = next(batch[m] for m in names if m in batch)
        b, t = ref.shape[0], ref.shape[-1]

        # modality dropout mask: one draw per modality per call, at least
        # one modality survives (reference model.py:134-141).  Parity note:
        # like the reference's np.random.choice over the dropped list, the
        # guaranteed survivor is drawn over ALL feature_dims entries —
        # including absent-modality zero fillers — so a feature_dims built
        # with absent modalities can in principle keep only a zero filler.
        # Moot in the app: Data drops features with no events before
        # feature_dims is built (reference main.py:152-163 does the same).
        if training and cfg.modality_dropout > 0:
            key = self.make_rng("modality")
            k1, k2 = jax.random.split(key)
            drops = jax.random.uniform(k1, (n_mod,)) < cfg.modality_dropout
            keep = jax.random.randint(k2, (), 0, n_mod)
            drops = jnp.where(
                drops.all() & (jnp.arange(n_mod) == keep), False, drops
            )
        else:
            drops = jnp.zeros((n_mod,), bool)

        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        tensors = []
        for i, modality in enumerate(names):
            if modality not in self.projectors:
                # zero filler must match the projector output width:
                # hidden//n_mod under "cat", full hidden under "sum"
                proj_dim = (
                    cfg.hidden
                    if cfg.feature_aggregation == "sum"
                    else cfg.hidden // n_mod
                )
                tensors.append(jnp.zeros((b, t, proj_dim), dtype))
                continue
            data = self._prepare_modality(batch[modality]).astype(dtype)
            data = self.projectors[modality](data)
            data = jnp.where(drops[i], jnp.zeros_like(data), data)
            tensors.append(data)
        if cfg.feature_aggregation == "cat":
            return jnp.concatenate(tensors, axis=-1)
        return sum(tensors)

    def transformer_forward(
        self,
        x: jax.Array,
        subject_id: jax.Array | None = None,
        training: bool = False,
    ) -> jax.Array:
        x = x + self.time_pos_embed[:, : x.shape[1]].astype(x.dtype)
        if self.config.subject_embedding and subject_id is not None:
            x = x + self.subject_embed(subject_id.reshape(-1))[:, None, :].astype(x.dtype)
        return self.encoder(x, deterministic=not training)

    def get_brain_latents(
        self, batch: tp.Mapping[str, jax.Array], training: bool = False
    ) -> jax.Array:
        x = self.aggregate_features(batch, training)
        return self.transformer_forward(x, batch.get("subject_id"), training)

    def get_modality_latents(
        self, batch: tp.Mapping[str, jax.Array], modality: str
    ) -> jax.Array:
        data = self._prepare_modality(batch[modality])
        return self.contrastive_heads[modality](data)

    def _readout(
        self,
        latents: jax.Array,
        batch: tp.Mapping[str, jax.Array],
        pool_outputs: bool,
    ) -> jax.Array:
        """(B, T, H) brain latents -> (B, O, T') predictions (per-subject
        readout + AdaptiveAvgPool TR binning); shared by __call__ and the
        contrastive forward so the two paths cannot drift."""
        x = jnp.swapaxes(latents, 1, 2)  # (B, H, T)
        x = self.predictor(x, batch.get("subject_id"))  # (B, O, T)
        if pool_outputs:
            mat = jnp.asarray(
                adaptive_avg_pool_matrix(x.shape[-1], self.n_output_timesteps)
            )
            x = x.astype(jnp.float32) @ mat
        return x.astype(jnp.float32)

    # -- main entry points ------------------------------------------------
    def __call__(
        self,
        batch: tp.Mapping[str, jax.Array],
        training: bool = False,
        pool_outputs: bool = True,
    ) -> jax.Array:
        latents = self.get_brain_latents(batch, training)  # (B, T, H)
        return self._readout(latents, batch, pool_outputs)

    def forward_with_contrastive(
        self,
        batch: tp.Mapping[str, jax.Array],
        training: bool = False,
        pool_outputs: bool = True,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Predictions + InfoNCE losses in one pass.

        Unlike the reference (which recomputes the trunk for the
        contrastive term, model.py:223-241), the brain latents are shared
        between the readout and the contrastive head — one trunk forward
        per step.
        """
        cfg = self.config
        latents = self.get_brain_latents(batch, training)  # (B, T, H)
        x = self._readout(latents, batch, pool_outputs)
        losses: dict[str, jax.Array] = {}
        if cfg.contrastive_enabled:
            for modality in cfg.contrastive_modalities:
                if modality not in self.contrastive_heads or modality not in batch:
                    continue
                mod = self.get_modality_latents(batch, modality)
                if mod.shape[1] != latents.shape[1]:
                    pmat = jnp.asarray(
                        adaptive_avg_pool_matrix(mod.shape[1], latents.shape[1])
                    )
                    mod = jnp.einsum("btd,ts->bsd", mod, pmat)
                losses[modality] = _info_nce(
                    latents.astype(jnp.float32),
                    mod.astype(jnp.float32),
                    cfg.contrastive_temperature,
                )
        return x.astype(jnp.float32), losses

    def contrastive_losses(
        self, batch: tp.Mapping[str, jax.Array], training: bool = False
    ) -> dict[str, jax.Array]:
        """Symmetric InfoNCE per selected modality (reference model.py:208-241)."""
        cfg = self.config
        if not cfg.contrastive_enabled:
            return {}
        brain = self.get_brain_latents(batch, training)  # (B, T, H)
        losses: dict[str, jax.Array] = {}
        for modality in cfg.contrastive_modalities:
            if modality not in self.contrastive_heads or modality not in batch:
                continue
            mod = self.get_modality_latents(batch, modality)
            if mod.shape[1] != brain.shape[1]:
                mat = jnp.asarray(
                    adaptive_avg_pool_matrix(mod.shape[1], brain.shape[1])
                )
                mod = jnp.einsum("btd,ts->bsd", mod, mat)
            # fp32 cast matches forward_with_contrastive (line ~268): the
            # two InfoNCE paths must agree bit-for-bit under bf16 configs
            losses[modality] = _info_nce(
                brain.astype(jnp.float32),
                mod.astype(jnp.float32),
                cfg.contrastive_temperature,
            )
        return losses


def _safe_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # eps inside the sqrt: grad is finite even for exactly-zero rows
    # (zero-padded timesteps through zero-init bias heads hit this)
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + eps)
    return x / norm


def _info_nce(q: jax.Array, k: jax.Array, tau: float = 0.07) -> jax.Array:
    """Symmetric InfoNCE with positives on the diagonal.

    CE against diagonal labels is mean(logsumexp(row) - diag), and the
    diagonal of (q @ k.T)/tau is sum(q*k)/tau — so neither the bt x bt
    eye mask nor a log_softmax materialization (two full bt x bt logp
    arrays at flagship bt=4768 -> 91 MB each) nor the transpose is
    needed; row/col logsumexp both reduce the ONE logits product.
    Matches reference model.py:223-241 semantics."""
    bt = q.shape[0] * q.shape[1]
    h = q.shape[2]
    q = _safe_normalize(q.reshape(bt, h))
    k = _safe_normalize(k.reshape(bt, h))
    logits = (q @ k.T) / tau
    diag = jnp.sum(q * k, axis=-1) / tau
    row = jax.nn.logsumexp(logits, axis=1)
    col = jax.nn.logsumexp(logits, axis=0)
    return 0.5 * ((row - diag).mean() + (col - diag).mean())
