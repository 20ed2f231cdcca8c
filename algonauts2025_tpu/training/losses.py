"""Loss functions + config registry.

Rebuild of reference modeling_utils/losses/ (PearsonLoss at losses.py:11-42
plus auto-wrapped torch losses).  Losses are pure jittable functions over
(N, D) arrays; the config surface keeps the reference's names
("MSELoss", "SmoothL1Loss", ...) so grid configs port unchanged.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import pydantic

__all__ = ["LossConfig", "PearsonLossConfig", "TorchLossConfig", "build_loss"]

LossFn = tp.Callable[[jax.Array, jax.Array], jax.Array]


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def huber_loss(pred: jax.Array, target: jax.Array, delta: float = 1.0) -> jax.Array:
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad**2 + delta * (abs_err - quad))


def smooth_l1_loss(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    err = jnp.abs(pred - target)
    return jnp.mean(jnp.where(err < beta, 0.5 * err**2 / beta, err - 0.5 * beta))


def pearson_loss(
    pred: jax.Array,
    target: jax.Array,
    dim: int = 1,
    eps: float = 1e-8,
    reduction: str = "mean",
) -> jax.Array:
    """1 - r per column of (N, D), reduced like torch losses
    (reference losses.py:17-42)."""
    x = jnp.moveaxis(pred, dim, 0)
    y = jnp.moveaxis(target, dim, 0)
    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)
    x = x - x.mean(axis=1, keepdims=True)
    y = y - y.mean(axis=1, keepdims=True)
    cov = jnp.sum(x * y, axis=1)
    # eps inside the sqrt: finite gradient for constant (zero-variance) rows
    xs = jnp.sqrt(jnp.sum(x**2, axis=1) + eps)
    ys = jnp.sqrt(jnp.sum(y**2, axis=1) + eps)
    pcc = cov / (xs * ys + eps)
    per_column = 1 - pcc
    if reduction == "sum":
        return jnp.sum(per_column)
    if reduction == "none":
        return per_column
    return jnp.mean(per_column)


def bce_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-12) -> jax.Array:
    p = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))


def bce_with_logits_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    # log-sum-exp form, numerically stable for large |pred|
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def kl_div_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.KLDivLoss semantics: pred is log-probabilities, target is
    probabilities; default "mean" reduction averages over all elements."""
    safe = jnp.where(target > 0, target * (jnp.log(jnp.maximum(target, 1e-38)) - pred), 0.0)
    return jnp.mean(safe)


def poisson_nll_loss(pred: jax.Array, target: jax.Array, log_input: bool = True,
                     eps: float = 1e-8) -> jax.Array:
    if log_input:
        return jnp.mean(jnp.exp(pred) - target * pred)
    return jnp.mean(pred - target * jnp.log(pred + eps))


def cross_entropy_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss with probability targets over the last axis."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    return jnp.mean(-jnp.sum(target * logp, axis=-1))


def soft_margin_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.log1p(jnp.exp(-target * pred)))


def nll_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.NLLLoss: pred is (N, C) log-probabilities.  Integer targets
    select a class per row (torch semantics); float targets of pred's shape
    are treated as soft class weights (documented extension — torch NLLLoss
    rejects them, but fMRI-shaped targets would crash torch here too)."""
    if jnp.issubdtype(target.dtype, jnp.integer):
        picked = jnp.take_along_axis(pred, target[:, None], axis=-1)[:, 0]
        return -jnp.mean(picked)
    return -jnp.mean(jnp.sum(target * pred, axis=-1))


def margin_ranking_loss(
    x1: jax.Array, x2: jax.Array, target: jax.Array, margin: float = 0.0
) -> jax.Array:
    """torch.nn.MarginRankingLoss — inherently three-argument
    (input1, input2, target); the built callable keeps torch's signature, so
    like the reference's auto-wrap (losses/base.py:43-59) it validates in
    config but cannot be driven by the two-argument trainer step."""
    return jnp.mean(jnp.maximum(0.0, -target * (x1 - x2) + margin))


def hinge_embedding_loss(
    pred: jax.Array, target: jax.Array, margin: float = 1.0
) -> jax.Array:
    """torch.nn.HingeEmbeddingLoss: x where y==1, max(0, margin-x) where y==-1."""
    return jnp.mean(
        jnp.where(target > 0, pred, jnp.maximum(0.0, margin - pred))
    )


def multilabel_soft_margin_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.MultiLabelSoftMarginLoss: per-class sigmoid BCE on logits,
    mean over classes then over rows."""
    # log sigmoid(x) = -softplus(-x); log sigmoid(-x) = -softplus(x)
    per_class = target * jax.nn.softplus(-pred) + (1 - target) * jax.nn.softplus(pred)
    return jnp.mean(jnp.mean(per_class, axis=-1))


def gaussian_nll_loss(
    pred: jax.Array, target: jax.Array, var: jax.Array,
    full: bool = False, eps: float = 1e-6,
) -> jax.Array:
    """torch.nn.GaussianNLLLoss (3-argument: input, target, var)."""
    v = jnp.maximum(var, eps)
    out = 0.5 * (jnp.log(v) + (pred - target) ** 2 / v)
    if full:
        out = out + 0.5 * jnp.log(jnp.asarray(2 * jnp.pi))
    return jnp.mean(out)


def cosine_embedding_loss(
    x1: jax.Array, x2: jax.Array, target: jax.Array, margin: float = 0.0,
    eps: float = 1e-8,
) -> jax.Array:
    """torch.nn.CosineEmbeddingLoss (3-argument)."""
    cos = jnp.sum(x1 * x2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1), eps
    )
    per_row = jnp.where(target > 0, 1.0 - cos, jnp.maximum(0.0, cos - margin))
    return jnp.mean(per_row)


def triplet_margin_loss(
    anchor: jax.Array, positive: jax.Array, negative: jax.Array,
    margin: float = 1.0, p: float = 2.0, eps: float = 1e-6,
) -> jax.Array:
    """torch.nn.TripletMarginLoss — replicates F.pairwise_distance's
    elementwise +eps quirk."""
    dist = lambda a, b: jnp.sum(jnp.abs(a - b + eps) ** p, axis=-1) ** (1.0 / p)
    return jnp.mean(
        jnp.maximum(0.0, dist(anchor, positive) - dist(anchor, negative) + margin)
    )


def multi_margin_loss(
    pred: jax.Array, target: jax.Array, p: float = 1.0, margin: float = 1.0
) -> jax.Array:
    """torch.nn.MultiMarginLoss: class-index targets over (N, C) scores."""
    n, c = pred.shape
    true_score = jnp.take_along_axis(pred, target[:, None].astype(jnp.int32), axis=-1)
    viol = jnp.maximum(0.0, margin - true_score + pred) ** p
    onehot = jax.nn.one_hot(target, c, dtype=bool)
    return jnp.mean(jnp.sum(jnp.where(onehot, 0.0, viol), axis=-1) / c)


def multilabel_margin_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.MultiLabelMarginLoss: int targets, -1-terminated per row."""
    n, c = pred.shape
    tgt = target.astype(jnp.int32)
    # valid targets: everything before the first -1 in each row
    stop = jnp.cumsum(tgt < 0, axis=-1) > 0
    is_tgt_slot = ~stop
    safe = jnp.where(is_tgt_slot, jnp.maximum(tgt, 0), 0)
    tgt_mask = jnp.zeros((n, c), bool)
    tgt_mask = jax.vmap(
        lambda m, idx, valid: m.at[idx].max(valid)
    )(tgt_mask, safe, is_tgt_slot)
    # sum over (target j, non-target k) of max(0, 1 - (x[j] - x[k])) / C
    xj = jnp.take_along_axis(pred, safe, axis=-1)  # (N, S) target scores
    hinge = jnp.maximum(
        0.0, 1.0 - (xj[:, :, None] - pred[:, None, :])
    )  # (N, S, C)
    valid = is_tgt_slot[:, :, None] & ~tgt_mask[:, None, :]
    return jnp.mean(jnp.sum(jnp.where(valid, hinge, 0.0), axis=(1, 2)) / c)


def ctc_loss(
    log_probs: jax.Array,
    targets: jax.Array,
    input_lengths: jax.Array,
    target_lengths: jax.Array,
    blank: int = 0,
    reduction: str = "mean",
) -> jax.Array:
    """torch.nn.CTCLoss semantics on (T, N, C) log-probs via optax's CTC.

    torch's "mean" divides each sequence loss by its target length before
    averaging."""
    import optax

    t, n, c = log_probs.shape
    logits = jnp.transpose(log_probs, (1, 0, 2))  # (N, T, C)
    steps = jnp.arange(t)[None, :]
    logit_pad = (steps >= input_lengths[:, None]).astype(jnp.float32)
    s = targets.shape[1]
    label_pad = (jnp.arange(s)[None, :] >= target_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, targets, label_pad, blank_id=blank)
    if reduction == "sum":
        return jnp.sum(per_seq)
    if reduction == "none":
        return per_seq
    return jnp.mean(per_seq / jnp.maximum(target_lengths, 1))


_TORCH_STYLE_LOSSES: dict[str, tp.Callable[..., LossFn]] = {
    "MSELoss": lambda: mse_loss,
    "L1Loss": lambda: l1_loss,
    "HuberLoss": lambda delta=1.0: (
        lambda p, t: huber_loss(p, t, delta=delta)
    ),
    "SmoothL1Loss": lambda beta=1.0: (
        lambda p, t: smooth_l1_loss(p, t, beta=beta)
    ),
    "BCELoss": lambda: bce_loss,
    "BCEWithLogitsLoss": lambda: bce_with_logits_loss,
    "KLDivLoss": lambda: kl_div_loss,
    "PoissonNLLLoss": lambda log_input=True: (
        lambda p, t: poisson_nll_loss(p, t, log_input=log_input)
    ),
    "CrossEntropyLoss": lambda: cross_entropy_loss,
    "SoftMarginLoss": lambda: soft_margin_loss,
    "NLLLoss": lambda: nll_loss,
    "MarginRankingLoss": lambda margin=0.0: (
        lambda x1, x2, t: margin_ranking_loss(x1, x2, t, margin=margin)
    ),
    "HingeEmbeddingLoss": lambda margin=1.0: (
        lambda p, t: hinge_embedding_loss(p, t, margin=margin)
    ),
    "MultiLabelSoftMarginLoss": lambda: multilabel_soft_margin_loss,
    "GaussianNLLLoss": lambda full=False, eps=1e-6: (
        lambda p, t, v: gaussian_nll_loss(p, t, v, full=full, eps=eps)
    ),
    "CosineEmbeddingLoss": lambda margin=0.0: (
        lambda a, b, t: cosine_embedding_loss(a, b, t, margin=margin)
    ),
    "TripletMarginLoss": lambda margin=1.0, p=2.0: (
        lambda a, pos, neg: triplet_margin_loss(a, pos, neg, margin=margin, p=p)
    ),
    "MultiMarginLoss": lambda p=1.0, margin=1.0: (
        lambda x, t: multi_margin_loss(x, t, p=p, margin=margin)
    ),
    "MultiLabelMarginLoss": lambda: multilabel_margin_loss,
    "CTCLoss": lambda blank=0, reduction="mean": (
        lambda lp, t, il, tl: ctc_loss(lp, t, il, tl, blank=blank, reduction=reduction)
    ),
}


def _torch_default_kwargs(
    name: str, kwargs: dict[str, tp.Any], candidates: tp.Iterable[str]
) -> list[str]:
    """Of ``candidates``, the kwargs that exist on the torch.nn loss of the
    same name with a value equal to the torch default (behavioral no-ops)."""
    import inspect

    try:
        import torch.nn as nn
    except Exception:  # pragma: no cover - torch is baked into this env
        return []
    cls = getattr(nn, name, None)
    if cls is None:
        return []
    params = inspect.signature(cls.__init__).parameters
    noop = []
    for key in candidates:
        p = params.get(key)
        if (
            p is not None
            and p.default is not inspect.Parameter.empty
            and kwargs[key] == p.default
        ):
            noop.append(key)
    return noop


class BaseLossConfig(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="forbid")
    name: str

    def build(self) -> LossFn:
        raise NotImplementedError


class PearsonLossConfig(BaseLossConfig):
    name: tp.Literal["PearsonLoss"] = "PearsonLoss"
    reduction: str = "mean"
    dim: int = 1

    def build(self) -> LossFn:
        if self.reduction not in ("mean", "sum", "none"):
            raise ValueError(f"unknown reduction {self.reduction!r}")

        def fn(pred: jax.Array, target: jax.Array) -> jax.Array:
            return pearson_loss(
                pred, target, dim=self.dim, reduction=self.reduction
            )

        return fn


class TorchLossConfig(BaseLossConfig):
    """Reference-style name + kwargs for standard regression losses."""

    name: tp.Literal[tuple(_TORCH_STYLE_LOSSES.keys())]  # type: ignore[valid-type]
    kwargs: dict[str, tp.Any] = {}

    def build(self) -> LossFn:
        import inspect

        factory = _TORCH_STYLE_LOSSES[self.name]
        supported = set(inspect.signature(factory).parameters)
        kwargs = dict(self.kwargs)
        unknown = set(kwargs) - supported
        if unknown:
            # the reference auto-wrap validates against the TORCH signature
            # (losses/base.py:51), so a ported config may spell out torch
            # defaults this build doesn't parameterize (e.g. MSELoss
            # reduction='mean').  Accept those no-ops; anything that would
            # change the objective must still be loud — a silently-dropped
            # kwarg trains a different loss.
            for name in _torch_default_kwargs(self.name, kwargs, unknown):
                kwargs.pop(name)
                unknown.discard(name)
        if unknown:
            raise ValueError(
                f"{self.name}: unsupported kwargs {sorted(unknown)}; this "
                f"build supports {sorted(supported) or 'no kwargs'} (plus "
                "torch-default values of the torch constructor's kwargs)"
            )
        return factory(**kwargs)


LossConfig = tp.Annotated[
    tp.Union[PearsonLossConfig, TorchLossConfig],
    pydantic.Field(discriminator="name"),
]


def build_loss(config: tp.Any) -> LossFn:
    if isinstance(config, BaseLossConfig):
        return config.build()
    if isinstance(config, dict) and "name" in config:
        known = sorted(_TORCH_STYLE_LOSSES) + ["PearsonLoss"]
        if config["name"] not in known:
            raise ValueError(
                f"unknown loss {config['name']!r}; supported losses: "
                + ", ".join(known)
            )
    adapter = pydantic.TypeAdapter(LossConfig)
    return adapter.validate_python(config).build()
