"""Regression tests for the round-2b review findings (training/features)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pearson_loss_reductions(rng):
    from algonauts2025_tpu.training.losses import build_loss, pearson_loss

    pred = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    per = pearson_loss(pred, target, reduction="none")
    assert per.shape == (5,)
    np.testing.assert_allclose(
        float(pearson_loss(pred, target, reduction="sum")),
        float(jnp.sum(per)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(build_loss({"name": "PearsonLoss", "reduction": "sum"})(pred, target)),
        float(jnp.sum(per)),
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        build_loss({"name": "PearsonLoss", "reduction": "bogus"})


def test_sgd_weight_decay_applied(rng):
    """torch-style L2: decay must reach the update, not be silently dropped."""
    from algonauts2025_tpu.training.optim import OptimizerConfig

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.zeros((4,))}
    tx = OptimizerConfig(name="SGD", lr=0.1, kwargs={"weight_decay": 0.5}).build(0.1)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # zero gradient + L2 decay -> update = -lr * wd * w = -0.05
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-5)


def test_epoch_interval_schedule_steps_per_epoch():
    """interval='epoch' advances the schedule once per epoch (torch
    scheduler.step() semantics), not once per optimizer step."""
    from algonauts2025_tpu.training.optim import OptimConfig

    cfg = OptimConfig(
        optimizer={"name": "Adam", "lr": 1.0},
        scheduler={"name": "StepLR", "kwargs": {"step_size": 1, "gamma": 0.5}},
        interval="epoch",
    )
    _, schedule = cfg.build(total_steps=20, steps_per_epoch=5)
    lr = [float(schedule(s)) for s in (0, 4, 5, 9, 10)]
    assert lr[0] == lr[1]  # constant within epoch 0
    assert lr[2] == pytest.approx(lr[0] * 0.5)  # halved at epoch 1
    assert lr[3] == lr[2]
    assert lr[4] == pytest.approx(lr[0] * 0.25)

    with pytest.raises(ValueError):
        cfg.build(total_steps=20)  # steps_per_epoch required


def test_named_backbone_load_failure_is_loud(monkeypatch):
    """A real model name must never silently fall back to random weights
    (the cache is keyed by the config uid — a fallback would poison it)."""
    from algonauts2025_tpu.features.audio import Wav2VecBert
    from algonauts2025_tpu.features.text import LLAMA3p2
    from algonauts2025_tpu.features.video import VJEPA2

    for feat in (
        Wav2VecBert(model_name="definitely/not-a-model"),
        LLAMA3p2(model_name="definitely/not-a-model"),
        VJEPA2(model_name="definitely/not-a-model"),
    ):
        with pytest.raises(RuntimeError, match="refusing to substitute"):
            _ = feat.backbone


def test_text_encode_beyond_bucket_table(rng):
    """max_len beyond BUCKETS[-1] must extend the width, not crash."""
    from algonauts2025_tpu.features.text import HashTokenizer, TinyTextBackbone

    bb = TinyTextBackbone()
    long_text = " ".join(f"word{i}" for i in range(1500))
    ids, mask = bb.encode([long_text], max_len=2048)
    assert ids.shape[1] >= min(1500, 2048)
    assert mask.sum() > 1024  # nothing silently truncated to the old cap


def test_monitor_key_missing_raises(tmp_path, rng):
    """A misconfigured monitor must fail loudly, not silently early-stop."""
    from algonauts2025_tpu.data.dataset import SegmentData
    from algonauts2025_tpu.models import FmriEncoderConfig
    from algonauts2025_tpu.training import (
        BrainTrainer,
        OptimConfig,
        TrainerConfig,
        build_loss,
        build_metric,
    )

    cfg = FmriEncoderConfig(n_subjects=2, depth=1, hidden=16, heads=2)
    dims = {"text": (1, 8)}
    model = cfg.build(dims, n_outputs=4, n_output_timesteps=3)
    data = {
        "text": rng.standard_normal((2, 1, 8, 6)).astype(np.float32),
        "subject_id": np.zeros((2, 1), np.int64),
        "fmri": rng.standard_normal((2, 4, 3)).astype(np.float32),
    }
    batch = SegmentData(data=data, segments=[None, None])
    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(optimizer={"name": "Adam", "lr": 1e-3}),
        metrics={
            "val/pearson": build_metric(
                {"name": "MultidimPearsonCorrCoef", "log_name": "pearson"}
            )
        },
        config=TrainerConfig(
            n_epochs=1, folder=None, save_checkpoints=False,
            monitor="val/definitely_missing",
        ),
    )
    trainer.init_state(batch, total_steps=2)
    with pytest.raises(KeyError, match="definitely_missing"):
        trainer.fit(lambda epoch: [batch], lambda: [batch], steps_per_epoch=2)
