"""Model forward shapes, losses/metrics, and a tiny end-to-end training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algonauts2025_tpu.data.dataset import SegmentData
from algonauts2025_tpu.models import (
    FmriEncoderConfig,
    FmriMlpConfig,
    SubjectLayers,
    TransformerEncoderConfig,
)
from algonauts2025_tpu.training import (
    BrainTrainer,
    OptimConfig,
    TrainerConfig,
    build_loss,
    build_metric,
)


def _tiny_model(n_mod=2, hidden=64, depth=2, **kw):
    cfg = FmriEncoderConfig(
        n_subjects=3, hidden=hidden, depth=depth, heads=4, **kw
    )
    feature_dims = {"text": (2, 8), "audio": (2, 12)}
    if n_mod == 3:
        feature_dims["video"] = (2, 16)
    model = cfg.build(feature_dims, n_outputs=32, n_output_timesteps=10)
    return model, cfg, feature_dims


def _batch(feature_dims, b=4, t=20, t_out=10, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        m: rng.standard_normal((b, l, d, t)).astype(np.float32)
        for m, (l, d) in feature_dims.items()
    }
    data["subject_id"] = rng.integers(0, 3, size=(b, 1))
    data["fmri"] = rng.standard_normal((b, 32, t_out)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in data.items()}


def test_subject_layers_selects_weights(rng):
    model = SubjectLayers(in_channels=6, out_channels=4, n_subjects=3)
    x = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
    subjects = jnp.asarray([0, 2])
    params = model.init(jax.random.PRNGKey(0), x, subjects)
    out = model.apply(params, x, subjects)
    assert out.shape == (2, 4, 5)
    # manual check against the gathered weights
    w = params["params"]["weights"]
    b = params["params"]["bias"]
    exp0 = np.einsum("ct,cd->dt", np.asarray(x[0]), np.asarray(w[0])) + np.asarray(b[0])[:, None]
    np.testing.assert_allclose(np.asarray(out[0]), exp0, atol=1e-5)


def test_transformer_encoder_shapes(rng):
    enc = TransformerEncoderConfig(depth=2, heads=4, attn_dropout=0.0).build(dim=64)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_fmri_encoder_forward():
    model, cfg, fd = _tiny_model()
    batch = _batch(fd)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "modality": jax.random.PRNGKey(1)},
        batch,
        training=False,
    )
    out = model.apply(variables, batch, training=False)
    assert out.shape == (4, 32, 10)
    # sum aggregation also works
    model2, _, _ = _tiny_model(feature_aggregation="sum", layer_aggregation="mean")
    v2 = model2.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    out2 = model2.apply(v2, batch, training=False)
    assert out2.shape == (4, 32, 10)


def test_fmri_encoder_contrastive():
    model, cfg, fd = _tiny_model(
        contrastive_enabled=True, contrastive_modalities=["audio"]
    )
    batch = _batch(fd)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch,
        training=False,
        method="forward_with_contrastive",
    )
    preds, losses = model.apply(
        variables, batch, training=False, method="forward_with_contrastive"
    )
    assert preds.shape == (4, 32, 10)
    assert "audio" in losses
    assert float(losses["audio"]) > 0


def test_info_nce_matches_naive_softmax_form():
    """The logsumexp-minus-diag form must equal the textbook
    eye-mask/log_softmax InfoNCE in value AND gradient (the fast form
    replaced it to drop two bt x bt logp materializations)."""
    from algonauts2025_tpu.models.fmri_encoder import _info_nce, _safe_normalize

    def naive(q, k, tau=0.07):
        bt = q.shape[0] * q.shape[1]
        qn = _safe_normalize(q.reshape(bt, -1))
        kn = _safe_normalize(k.reshape(bt, -1))
        logits = (qn @ kn.T) / tau

        def ce_diag(lg):
            logp = jax.nn.log_softmax(lg, axis=-1)
            eye = jnp.eye(lg.shape[0], dtype=logp.dtype)
            return -(logp * eye).sum(axis=-1).mean()

        return 0.5 * (ce_diag(logits) + ce_diag(logits.T))

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((3, 7, 16)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 7, 16)), dtype=jnp.float32)
    # include an exactly-zero row (padded timestep) — the historical NaN trap
    q = q.at[0, 0].set(0.0)
    v_fast, g_fast = jax.value_and_grad(_info_nce)(q, k)
    v_naive, g_naive = jax.value_and_grad(naive)(q, k)
    np.testing.assert_allclose(float(v_fast), float(v_naive), rtol=1e-6)
    # the zero row's grad magnitude is ~x/sqrt(eps) ~ 1e5; compare relatively
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_naive), rtol=1e-5, atol=1e-6
    )
    assert np.isfinite(np.asarray(g_fast)).all()


def test_modality_dropout_keeps_one():
    model, cfg, fd = _tiny_model(modality_dropout=1.0)
    batch = _batch(fd)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    # with p=1.0 all modalities would drop; exactly one must survive
    x = model.apply(
        variables,
        batch,
        training=True,
        rngs={"modality": jax.random.PRNGKey(7)},
        method="aggregate_features",
    )
    arr = np.asarray(x).reshape(4, 20, 2, 32)  # (B, T, n_mod, hidden/n_mod)
    alive = [np.abs(arr[:, :, m]).sum() > 0 for m in range(2)]
    assert sum(alive) == 1


def test_missing_modality_sum_aggregation():
    """A modality with no projector (feature_dims=None) must fill zeros at
    the projector's width — full hidden under 'sum' aggregation."""
    cfg = FmriEncoderConfig(
        n_subjects=3, hidden=64, depth=1, heads=4, feature_aggregation="sum"
    )
    feature_dims = {"text": (2, 8), "audio": None}
    model = cfg.build(feature_dims, n_outputs=16, n_output_timesteps=5)
    batch = _batch({"text": (2, 8)}, t_out=5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    x = model.apply(variables, batch, training=False, method="aggregate_features")
    assert x.shape == (4, 20, 64)  # sum keeps full hidden width


def test_fmri_mlp_forward(rng):
    cfg = FmriMlpConfig(hidden=32, n_blocks=2, subject_layers=True, n_subjects=3)
    model = cfg.build(n_in_channels=16, n_outputs=8)
    x = jnp.asarray(rng.standard_normal((2, 16, 1)).astype(np.float32))
    subj = jnp.asarray([0, 1])
    params = model.init(jax.random.PRNGKey(0), x, subj)
    out = model.apply(params, x, subj)
    assert out.shape == (2, 8)


def test_losses():
    p = jnp.asarray(np.random.randn(20, 5).astype(np.float32))
    t = jnp.asarray(np.random.randn(20, 5).astype(np.float32))
    for name in ["MSELoss", "L1Loss", "HuberLoss", "SmoothL1Loss"]:
        fn = build_loss({"name": name})
        v = float(fn(p, t))
        assert np.isfinite(v) and v > 0
    fn = build_loss({"name": "PearsonLoss"})
    assert float(fn(p, p)) == pytest.approx(0.0, abs=1e-5)
    assert float(fn(p, t)) > 0.1


def test_losses_match_torch():
    """Every registered torch-named loss matches torch.nn on the same
    inputs (mean reduction, default kwargs)."""
    import torch

    rng = np.random.default_rng(0)
    raw = rng.standard_normal((24, 7)).astype(np.float32)
    tgt = rng.standard_normal((24, 7)).astype(np.float32)
    probs = 1 / (1 + np.exp(-raw))
    tprob = 1 / (1 + np.exp(-tgt))
    logp = np.log(probs / probs.sum(-1, keepdims=True))
    psum = tprob / tprob.sum(-1, keepdims=True)
    signs = np.sign(tgt) + (tgt == 0)
    counts = np.abs(tgt) * 3

    cases = {
        "MSELoss": (raw, tgt, torch.nn.MSELoss()),
        "L1Loss": (raw, tgt, torch.nn.L1Loss()),
        "HuberLoss": (raw, tgt, torch.nn.HuberLoss()),
        "SmoothL1Loss": (raw, tgt, torch.nn.SmoothL1Loss()),
        "BCELoss": (probs, tprob, torch.nn.BCELoss()),
        "BCEWithLogitsLoss": (raw, tprob, torch.nn.BCEWithLogitsLoss()),
        "KLDivLoss": (logp, psum, torch.nn.KLDivLoss(reduction="mean")),
        "PoissonNLLLoss": (raw, counts, torch.nn.PoissonNLLLoss(full=False)),
        "CrossEntropyLoss": (raw, psum, torch.nn.CrossEntropyLoss()),
        "SoftMarginLoss": (raw, signs, torch.nn.SoftMarginLoss()),
    }
    classes = rng.integers(0, 7, size=(24,))
    binlab = (tgt > 0).astype(np.float32)
    cases.update(
        {
            "NLLLoss": (logp, classes, torch.nn.NLLLoss()),
            "HingeEmbeddingLoss": (raw, signs, torch.nn.HingeEmbeddingLoss()),
            "MultiLabelSoftMarginLoss": (
                raw,
                binlab,
                torch.nn.MultiLabelSoftMarginLoss(),
            ),
        }
    )
    for name, (a, b, ref) in cases.items():
        ours = float(build_loss({"name": name})(jnp.asarray(a), jnp.asarray(b)))
        theirs = float(ref(torch.from_numpy(a), torch.from_numpy(b)))
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5), name

    # MarginRankingLoss keeps torch's inherent 3-arg signature
    x2 = rng.standard_normal((24, 7)).astype(np.float32)
    ours = float(
        build_loss({"name": "MarginRankingLoss", "kwargs": {"margin": 0.2}})(
            jnp.asarray(raw), jnp.asarray(x2), jnp.asarray(signs)
        )
    )
    theirs = float(
        torch.nn.MarginRankingLoss(margin=0.2)(
            torch.from_numpy(raw), torch.from_numpy(x2), torch.from_numpy(signs)
        )
    )
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5)


def test_unknown_loss_lists_supported():
    with pytest.raises(ValueError, match="PearsonLoss"):
        build_loss({"name": "NoSuchLoss"})


def test_loss_accepts_torch_default_kwargs_rejects_changed():
    """A config ported from the reference may spell out torch defaults
    (valid under the reference's torch-signature validation,
    losses/base.py:51): no-op values build, behavior-changing ones are
    still loud (r3 review)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((4, 5)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((4, 5)).astype(np.float32)
    fn = build_loss({"name": "MSELoss", "kwargs": {"reduction": "mean"}})
    base = build_loss({"name": "MSELoss"})
    assert float(fn(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(base(jnp.asarray(a), jnp.asarray(b)))
    )
    with pytest.raises(ValueError, match="unsupported kwargs"):
        build_loss({"name": "MSELoss", "kwargs": {"reduction": "sum"}})
    with pytest.raises(ValueError, match="unsupported kwargs"):
        build_loss({"name": "MSELoss", "kwargs": {"not_a_kwarg": 1}})


def test_multiarg_losses_match_torch():
    """The remaining torch auto-wrap losses (3/4-argument signatures kept,
    as the reference's wrap does, reference losses/base.py:43-59)."""
    import torch

    rng = np.random.default_rng(3)
    n, c = 16, 9
    x1 = rng.standard_normal((n, c)).astype(np.float32)
    x2 = rng.standard_normal((n, c)).astype(np.float32)
    x3 = rng.standard_normal((n, c)).astype(np.float32)
    signs = np.where(rng.random(n) < 0.5, -1.0, 1.0).astype(np.float32)
    var = (np.abs(x2) + 0.1).astype(np.float32)
    classes = rng.integers(0, c, size=(n,))

    def both(name, kwargs, ours_args, torch_mod, torch_args):
        ours = float(build_loss({"name": name, "kwargs": kwargs})(*ours_args))
        theirs = float(torch_mod(*torch_args))
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5), name

    both(
        "GaussianNLLLoss", {},
        (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(var)),
        torch.nn.GaussianNLLLoss(),
        (torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(var)),
    )
    both(
        "CosineEmbeddingLoss", {"margin": 0.1},
        (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(signs)),
        torch.nn.CosineEmbeddingLoss(margin=0.1),
        (torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(signs)),
    )
    both(
        "TripletMarginLoss", {},
        (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x3)),
        torch.nn.TripletMarginLoss(),
        (torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(x3)),
    )
    both(
        "MultiMarginLoss", {},
        (jnp.asarray(x1), jnp.asarray(classes)),
        torch.nn.MultiMarginLoss(),
        (torch.from_numpy(x1), torch.from_numpy(classes)),
    )

    # MultiLabelMarginLoss: -1-terminated class-index targets
    ml_tgt = np.full((n, c), -1, np.int64)
    for i in range(n):
        k = int(rng.integers(1, 4))
        ml_tgt[i, :k] = rng.choice(c, size=k, replace=False)
    ours = float(build_loss({"name": "MultiLabelMarginLoss"})(
        jnp.asarray(x1), jnp.asarray(ml_tgt)
    ))
    theirs = float(
        torch.nn.MultiLabelMarginLoss()(torch.from_numpy(x1), torch.from_numpy(ml_tgt))
    )
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5)

    # CTCLoss via optax, torch mean semantics
    t, nb, nc, s = 12, 4, 6, 5
    logp = torch.log_softmax(torch.from_numpy(
        rng.standard_normal((t, nb, nc)).astype(np.float32)), dim=-1)
    tgt = torch.from_numpy(rng.integers(1, nc, size=(nb, s)))
    il = torch.full((nb,), t, dtype=torch.long)
    tl = torch.from_numpy(rng.integers(2, s + 1, size=(nb,)))
    theirs = float(torch.nn.CTCLoss(blank=0)(logp, tgt, il, tl))
    ours = float(build_loss({"name": "CTCLoss"})(
        jnp.asarray(logp.numpy()), jnp.asarray(tgt.numpy()),
        jnp.asarray(il.numpy()), jnp.asarray(tl.numpy()),
    ))
    assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-4)


def test_optimizer_registry_smoke():
    from algonauts2025_tpu.training import OptimConfig

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    for name in ["Adam", "AdamW", "SGD", "Adagrad", "RMSprop", "Lion",
                 "Adamax", "NAdam", "RAdam", "Adadelta", "LAMB"]:
        tx, _ = OptimConfig(optimizer={"name": name, "lr": 1e-3}).build(total_steps=10)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all(), name
    with pytest.raises(ValueError, match="Unknown optimizer"):
        OptimConfig(optimizer={"name": "Nope", "lr": 1e-3}).build(total_steps=10)


def test_metrics_surface():
    m = build_metric(
        {"log_name": "pearson", "name": "MultidimPearsonCorrCoef", "kwargs": {"num_outputs": 5}}
    )
    p = jnp.asarray(np.random.randn(30, 5).astype(np.float32))
    m.update(p, p)
    assert m.compute() == pytest.approx(1.0, abs=1e-4)

    g = build_metric(
        {"log_name": "subj", "name": "GroupedMetric",
         "metric_name": "MultidimPearsonCorrCoef", "kwargs": {"num_outputs": 5}},
        n_groups=2,
    )
    groups = jnp.asarray([0] * 15 + [1] * 15)
    g.update(p, p, groups=groups)
    out = g.compute()
    assert out["0"] == pytest.approx(1.0, abs=1e-4)
    assert out["1"] == pytest.approx(1.0, abs=1e-4)

    topk = build_metric({"log_name": "ret", "name": "TopkAcc", "topk": 1})
    topk.update(p, p)
    assert topk.compute() == 1.0


def test_grouped_metric_wraps_any_metric():
    """GroupedMetric wraps retrieval and online metrics, not just Pearson
    (reference metrics/base.py:39-91 parity)."""
    p = jnp.asarray(np.random.default_rng(0).standard_normal((30, 5)).astype(np.float32))
    groups = jnp.asarray([0] * 15 + [1] * 15)

    g_topk = build_metric(
        {"log_name": "g", "name": "GroupedMetric", "metric_name": "TopkAcc",
         "kwargs": {"topk": 1}}
    )
    assert g_topk.is_retrieval and g_topk.needs_groups
    g_topk.update(p, p, groups=groups)
    out = g_topk.compute()
    assert out == {"0": 1.0, "1": 1.0}

    g_online = build_metric(
        {"log_name": "g2", "name": "GroupedMetric",
         "metric_name": "OnlinePearsonCorr", "kwargs": {"reduction": "mean"}}
    )
    assert not g_online.is_retrieval
    g_online.update(p, p, groups=groups)
    vals = g_online.compute()
    assert vals["0"] == pytest.approx(1.0, abs=1e-4)

    with pytest.raises(ValueError, match="unknown metric"):
        build_metric(
            {"log_name": "bad", "name": "GroupedMetric", "metric_name": "Nope"}
        )


def test_single_row_group_emits_nan_with_warning():
    """A subject with one val segment must stay visible as NaN, not vanish
    (round-2 VERDICT weak #5)."""
    from algonauts2025_tpu.training.metrics import GroupedPearson

    m = GroupedPearson(n_groups=3)
    p = jnp.asarray(np.random.default_rng(1).standard_normal((11, 4)).astype(np.float32))
    groups = jnp.asarray([0] * 10 + [1])  # group 1: one row; group 2: absent
    m.update(p, p, groups=groups)
    with pytest.warns(RuntimeWarning, match="group 1 has only 1"):
        out = m.compute()
    assert out["0"] == pytest.approx(1.0, abs=1e-4)
    assert np.isnan(out["1"])
    assert "2" not in out  # never-seen group ids stay absent


def test_metric_never_updated_raises():
    from algonauts2025_tpu.training.metrics import (
        GroupedMetric,
        GroupedPearson,
        MetricNeverUpdated,
        MultidimPearsonCorrCoef,
        Rank,
        TopkAcc,
    )

    for m in [
        MultidimPearsonCorrCoef(),
        GroupedPearson(n_groups=2),
        Rank(),
        TopkAcc(),
        GroupedMetric(MultidimPearsonCorrCoef),
    ]:
        with pytest.raises(MetricNeverUpdated):
            m.compute()


def test_evaluate_propagates_broken_metric():
    """trainer.evaluate must skip never-updated metrics but NOT swallow a
    metric whose compute genuinely fails (round-2 VERDICT weak #6)."""
    from algonauts2025_tpu.training.metrics import Metric, MetricNeverUpdated
    from algonauts2025_tpu.training.trainer import BrainTrainer

    class Broken(Metric):
        def reset(self):
            pass

        def update(self, preds, target, groups=None):
            pass

        def compute(self):
            raise ValueError("boom")

    class Skippable(Metric):
        def reset(self):
            pass

        def compute(self):
            raise MetricNeverUpdated()

    # drive the real evaluate() on an empty loader: Skippable must be
    # silently dropped, Broken must propagate
    t = BrainTrainer.__new__(BrainTrainer)
    t.metrics = {"val/skippable": Skippable()}
    t.state = object()
    t._eval_step = lambda *a: None
    t._eval_step_with_loss = lambda *a: None
    t.mesh = None
    out = t.evaluate([], split="val")
    assert out == {}

    t.metrics = {"val/broken": Broken()}
    with pytest.raises(ValueError, match="boom"):
        t.evaluate([], split="val")


def test_metric_capability_flags():
    from algonauts2025_tpu.training.metrics import (
        GroupedPearson,
        MultidimPearsonCorrCoef,
        Rank,
        TopkAcc,
    )

    assert TopkAcc().is_retrieval and Rank().is_retrieval
    assert not MultidimPearsonCorrCoef().is_retrieval
    assert GroupedPearson(n_groups=2).needs_groups
    assert not MultidimPearsonCorrCoef().needs_groups


def test_submission_naming_follows_data():
    from algonauts2025_tpu.experiment.experiment import Experiment

    assert Experiment._season_prefix("movie:7") == "s07"
    assert Experiment._season_prefix("movie:12") == "s12"
    assert Experiment._season_prefix("movie:bourne") == "bourne"
    assert Experiment._samples_tag("s07") == "friends-s7"
    assert Experiment._samples_tag("s03") == "friends-s3"
    assert Experiment._samples_tag("bourne") == "bourne"


def test_trainer_end_to_end(tmp_path):
    """A tiny model must overfit a learnable synthetic mapping."""
    model, cfg, fd = _tiny_model(hidden=32, depth=1)
    rng = np.random.default_rng(0)
    # fmri is a fixed linear readout of the text feature -> learnable
    w = rng.standard_normal((16, 32)).astype(np.float32) * 0.5

    def make_batch(seed):
        d = _batch(fd, b=4, seed=seed)
        text = np.asarray(d["text"])  # (B, 2, 8, 20)
        flat = text.reshape(4, 16, 20).transpose(0, 2, 1)  # B, T, 16
        y = (flat @ w).transpose(0, 2, 1)  # B, 32, 20
        y = y.reshape(4, 32, 10, 2).mean(-1)  # pool to 10
        d["fmri"] = jnp.asarray(y)
        return SegmentData(data={k: np.asarray(v) for k, v in d.items()}, segments=[None] * 4)  # type: ignore[list-item]

    batches = [make_batch(s) for s in range(6)]
    val = [make_batch(100)]

    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(
            optimizer={"name": "Adam", "lr": 1e-2},
            scheduler={"name": "OneCycleLR", "kwargs": {"max_lr": 1e-2, "pct_start": 0.1}},
        ),
        metrics={
            "val/pearson": build_metric(
                {"log_name": "pearson", "name": "MultidimPearsonCorrCoef"}
            )
        },
        config=TrainerConfig(
            n_epochs=25, folder=tmp_path, seed=0, swa_start=0.8, patience=None
        ),
    )
    trainer.init_state(batches[0], total_steps=25 * len(batches))
    trainer.fit(lambda epoch: iter(batches), lambda: iter(val))
    final = trainer.history[-1]
    assert final["val/pearson"] > 0.5, trainer.history
    # checkpoints saved and reloadable
    assert (tmp_path / "last.ckpt").exists()
    start_epoch = trainer.load_checkpoint(tmp_path / "last.ckpt")
    assert start_epoch >= 24


def test_transformer_config_rejects_unsupported_parity_fields():
    """Fields the reference forwards to x_transformers (changing the
    architecture) must fail loudly, not silently build a rotary/ScaleNorm
    trunk under a config that claims otherwise."""
    TransformerEncoderConfig(depth=2, heads=4).build(64)  # defaults fine
    for field, value in [
        ("use_rmsnorm", True),
        ("rel_pos_bias", True),
        ("alibi_pos_bias", True),
        ("rotary_xpos", True),
        ("residual_attn", True),
        ("cross_attend", True),
        ("layer_dropout", 0.25),
    ]:
        cfg = TransformerEncoderConfig(depth=2, heads=4, **{field: value})
        with pytest.raises(NotImplementedError, match=field):
            cfg.build(64)
    # attn_flash is a kernel choice, not an architecture change: accepted
    TransformerEncoderConfig(depth=2, heads=4, attn_flash=True).build(64)


def test_causal_remat_trunk_trains(rng):
    """nn.remat must not declare the causal mask static (jax.checkpoint
    rejects traced statics): causal=True + remat=True forward AND grad."""
    from algonauts2025_tpu.models.transformer import TransformerEncoder

    enc = TransformerEncoder(dim=32, depth=2, heads=4, causal=True, remat=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 32)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return enc.apply({"params": p}, x).sum()

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert flat and all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_remat_policy_save_attn_out_identical(rng):
    """remat_policy='save_attn_out' is a pure HBM-vs-recompute trade:
    forward outputs and gradients must be IDENTICAL to full remat (the
    checkpoint policy changes what is saved, never what is computed)."""
    from algonauts2025_tpu.models.transformer import TransformerEncoder

    x = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    outs, grads = [], []
    for policy in (None, "save_attn_out"):
        enc = TransformerEncoder(
            dim=32, depth=2, heads=4, remat=True, remat_policy=policy
        )
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        outs.append(np.asarray(jax.jit(enc.apply)({"params": params}, x)))

        def loss(p, enc=enc):
            return (enc.apply({"params": p}, x) ** 2).sum()

        grads.append(jax.jit(jax.grad(loss))(params))
    np.testing.assert_array_equal(outs[0], outs[1])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        grads[0],
        grads[1],
    )
    with pytest.raises(ValueError, match="unknown remat_policy"):
        enc = TransformerEncoder(dim=32, depth=2, heads=4, remat=True,
                                 remat_policy="bogus")
        enc.init(jax.random.PRNGKey(0), x)


def test_mlp_trailing_dropout_parity():
    """torchvision MLP ends with Dropout after the final Linear; the
    bare-Linear build (no hidden sizes) has none (reference common.py
    MlpConfig.build)."""
    from algonauts2025_tpu.models.common import Mlp

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    m = Mlp(hidden_sizes=[16], output_size=64, dropout=0.5)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    zero_frac = float(np.mean(np.asarray(y) == 0.0))
    assert 0.2 < zero_frac < 0.8  # trailing dropout zeroes ~half the outputs
    bare = Mlp(hidden_sizes=[], output_size=64, dropout=0.5)
    bparams = bare.init(jax.random.PRNGKey(0), x)["params"]
    yb = bare.apply(
        {"params": bparams}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert float(np.mean(np.asarray(yb) == 0.0)) == 0.0  # bare Linear: no dropout


def test_grouped_pearson_validates_num_outputs():
    """num_outputs was previously accepted and silently discarded; it must
    now constrain the voxel dim or be omitted."""
    from algonauts2025_tpu.training.metrics import GroupedPearson

    preds = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)))
    m = GroupedPearson(n_groups=2, num_outputs=8)
    m.update(preds, preds, groups=jnp.zeros((4,), jnp.int32))  # ok
    m2 = GroupedPearson(n_groups=2, num_outputs=500)
    with pytest.raises(ValueError, match="num_outputs=500"):
        m2.update(preds, preds, groups=jnp.zeros((4,), jnp.int32))


def test_grouped_pearson_rejects_out_of_range_groups():
    """segment_sum silently DROPS ids >= n_groups; the sentinel slot must
    surface them at compute() instead of vanishing subjects (r4 review)."""
    from algonauts2025_tpu.training.metrics import GroupedPearson

    rng = np.random.default_rng(0)
    preds = jnp.asarray(rng.standard_normal((6, 4)))
    target = jnp.asarray(rng.standard_normal((6, 4)))
    m = GroupedPearson(n_groups=2)
    m.update(preds, target, groups=jnp.asarray([0, 1, 0, 1, 2, 3]))
    with pytest.raises(ValueError, match="group id outside"):
        m.compute()
    # in-range ids still work and match the ungrouped computation
    m2 = GroupedPearson(n_groups=2)
    m2.update(preds, target, groups=jnp.asarray([0, 1, 0, 1, 0, 1]))
    out = m2.compute()
    assert set(out) == {"0", "1"}


def test_scheduler_rejects_unknown_kwargs():
    """torch honors scheduler kwargs; silently dropping one here would
    train a different LR trajectory (r4 review)."""
    from algonauts2025_tpu.training.optim import SchedulerConfig

    ok = SchedulerConfig(name="OneCycleLR", kwargs={"max_lr": 1e-3, "pct_start": 0.2})
    assert float(ok.build(1e-3, 100)(0)) > 0
    for name, kw in [
        ("OneCycleLR", {"max_lr": 1e-3, "anneal_strategy": "linear"}),
        ("OneCycleLR", {"divfactor": 10.0}),  # typo of div_factor
        ("CosineAnnealingLR", {"T_max": 10, "last_epoch": 5}),
        ("StepLR", {"step_size": 3, "verbose": True}),
        ("LinearLR", {"total_iters": 2, "warmup": 1}),
    ]:
        with pytest.raises(ValueError, match="scheduler kwargs"):
            SchedulerConfig(name=name, kwargs=kw).build(1e-3, 100)


def _mini_trainer(tmp_path, optim=None, depth=1, seed=0):
    model, cfg, fd = _tiny_model(hidden=32, depth=depth)
    batch = _batch(fd, b=4, seed=seed)
    sd = SegmentData(
        data={k: np.asarray(v) for k, v in batch.items()}, segments=[None] * 4
    )  # type: ignore[list-item]
    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=optim or OptimConfig(optimizer={"name": "Adam", "lr": 1e-3}),
        metrics={},
        config=TrainerConfig(n_epochs=1, folder=tmp_path, seed=0, patience=None),
    )
    trainer.init_state(sd, total_steps=4)
    return trainer, sd


def test_warm_start_ignores_optimizer_structure(tmp_path):
    """params_only must restore weights from a checkpoint written with a
    DIFFERENT optimizer config (a templated full-state restore would
    crash on the opt_state structure mismatch)."""
    src, _ = _mini_trainer(
        tmp_path / "src",
        optim=OptimConfig(
            optimizer={"name": "SGD", "lr": 1e-2, "kwargs": {"momentum": 0.9}}
        ),
    )
    src.save_checkpoint("last")
    dst, _ = _mini_trainer(tmp_path / "dst")  # Adam: different opt_state tree
    dst.load_checkpoint(tmp_path / "src" / "last.ckpt", strict=True, params_only=True)
    src_leaves = jax.tree_util.tree_leaves(src.state.params)
    dst_leaves = jax.tree_util.tree_leaves(dst.state.params)
    for a, b in zip(src_leaves, dst_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_strict_rejects_structural_mismatch(tmp_path):
    """strict=True warm start must fail loudly when the checkpoint lacks
    model parameters; strict=False adopts the intersection."""
    src, _ = _mini_trainer(tmp_path / "src", depth=1)
    src.save_checkpoint("last")
    dst, _ = _mini_trainer(tmp_path / "dst", depth=2)  # more params
    with pytest.raises(ValueError, match="missing"):
        dst.load_checkpoint(
            tmp_path / "src" / "last.ckpt", strict=True, params_only=True
        )
    before = jax.tree_util.tree_leaves(dst.state.params)
    dst.load_checkpoint(
        tmp_path / "src" / "last.ckpt", strict=False, params_only=True
    )
    after = jax.tree_util.tree_leaves(dst.state.params)
    assert len(before) == len(after)  # structure intact, intersection adopted


def test_resume_beats_explicit_checkpoint_path(tmp_path):
    """A preempted warm-started run must resume its own last.ckpt, not
    re-warm-start from the pretrained checkpoint every restart."""
    from algonauts2025_tpu.experiment.experiment import Experiment

    pre = tmp_path / "pretrained.ckpt"
    pre.mkdir()  # existence is all _get_checkpoint_path checks
    own = tmp_path / "run"
    own.mkdir()
    import types as _types

    exp = _types.SimpleNamespace(
        checkpoint_path=str(pre), infra=_types.SimpleNamespace(folder=str(own))
    )
    path, warm = Experiment._get_checkpoint_path(exp)
    assert path == pre and warm  # no own progress yet -> warm start
    (own / "last.ckpt").mkdir()
    path, warm = Experiment._get_checkpoint_path(exp)
    assert path == own / "last.ckpt" and not warm  # own progress wins


def test_contrastive_losses_method_matches_forward_path():
    """contrastive_losses and forward_with_contrastive must agree on the
    loss values — including under bf16, where the standalone method was
    missing the fp32 cast (r4 review)."""
    for bf16 in (False, True):
        model, cfg, fd = _tiny_model(
            contrastive_enabled=True, contrastive_modalities=["audio"], bf16=bf16
        )
        batch = _batch(fd)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, training=False,
            method="forward_with_contrastive",
        )
        _, fwd_losses = model.apply(
            variables, batch, training=False, method="forward_with_contrastive"
        )
        losses = model.apply(
            variables, batch, training=False, method="contrastive_losses"
        )
        assert set(losses) == set(fwd_losses)
        for k in losses:
            np.testing.assert_allclose(
                float(losses[k]), float(fwd_losses[k]), rtol=1e-6,
                err_msg=f"bf16={bf16} modality={k}",
            )


def test_fmri_mlp_rejects_unsupported_norm():
    """norm_type='bn' must fail loudly, not silently train LayerNorm+relu
    (r4 review; same convention as models/common.py Mlp)."""
    from algonauts2025_tpu.models import FmriMlpConfig

    cfg = FmriMlpConfig(hidden=16, n_blocks=1, norm_type="bn")
    model = cfg.build(n_in_channels=8, n_outputs=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 1)), jnp.float32)
    with pytest.raises(NotImplementedError, match="norm_type"):
        model.init(jax.random.PRNGKey(0), x)


def test_mean_module():
    from algonauts2025_tpu.models import Mean

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4)))
    out = Mean(axis=2).apply({}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean(axis=2), atol=1e-7)
    out2 = Mean(axis=1, keepdims=True).apply({}, x)
    assert out2.shape == (2, 1, 4)
