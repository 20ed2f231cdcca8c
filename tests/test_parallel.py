"""Mesh training: data-parallel and tensor-parallel paths on 8 CPU devices."""

import numpy as np
import pytest

import jax

from algonauts2025_tpu.data.dataset import SegmentData
from algonauts2025_tpu.models import FmriEncoderConfig
from algonauts2025_tpu.parallel import get_mesh, shard_batch
from algonauts2025_tpu.training import (
    BrainTrainer,
    OptimConfig,
    TrainerConfig,
    build_loss,
    build_metric,
)


def _setup(mesh, b):
    cfg = FmriEncoderConfig(n_subjects=4, hidden=96, depth=1, heads=4)
    fd = {"text": (2, 16), "audio": (2, 12)}
    model = cfg.build(fd, n_outputs=32, n_output_timesteps=10)
    rng = np.random.default_rng(0)
    data = {
        m: rng.standard_normal((b, l, d, 20)).astype(np.float32)
        for m, (l, d) in fd.items()
    }
    data["subject_id"] = rng.integers(0, 4, size=(b, 1))
    data["fmri"] = rng.standard_normal((b, 32, 10)).astype(np.float32)
    batch = SegmentData(data=data, segments=[None] * b)
    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(optimizer={"name": "Adam", "lr": 1e-3}),
        metrics={
            "val/pearson": build_metric(
                {"log_name": "pearson", "name": "MultidimPearsonCorrCoef"}
            )
        },
        config=TrainerConfig(n_epochs=2, folder=None, save_checkpoints=False, seed=0),
        mesh=mesh,
    )
    return trainer, batch


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_mesh_training(model_parallel):
    assert len(jax.devices()) >= 8
    mesh = get_mesh(n_devices=8, model_parallel=model_parallel)
    trainer, batch = _setup(mesh, b=2 * mesh.shape["data"])
    trainer.init_state(batch, total_steps=4)
    if model_parallel > 1:
        # readout weights actually sharded over the model axis
        w = trainer.state.params["predictor"]["weights"]
        spec = w.sharding.spec
        assert "model" in str(spec), spec
    trainer.fit(lambda e: iter([batch]), lambda: iter([batch]))
    assert np.isfinite(trainer.history[-1]["train/loss"])
    assert np.isfinite(trainer.history[-1]["val/pearson"])


def test_tp_engages_on_flagship_shapes(caplog):
    """At the real flagship shapes (3072-d trunk, 1000-parcel readouts),
    tp=2 must shard the majority of trainable elements — a silent
    replicate-everything fallback trains slower with zero signal."""
    import jax.numpy as jnp

    from algonauts2025_tpu.parallel.sharding import sharding_report

    mesh = get_mesh(n_devices=8, model_parallel=2)
    # param-shaped abstract tree: flagship readout + one trunk block
    params = {
        "predictor": {
            "weights": jnp.zeros((4, 3072, 1000)),
            "bias": jnp.zeros((4, 1000)),
        },
        "blocks": {
            "ff": {"in": {"kernel": jnp.zeros((8, 3072, 12288))},
                   "out": {"kernel": jnp.zeros((8, 12288, 3072))}},
            "qkv": {"kernel": jnp.zeros((8, 3072, 9216))},
        },
        "time_pos_embed": jnp.zeros((1, 1024, 3072)),
    }
    report = sharding_report(params, mesh)
    total = report["sharded"] + report["replicated"]
    assert report["sharded"] / total > 0.9, report

    # a readout that does not divide the model axis must replicate LOUDLY
    import logging

    bad = {"predictor": {"weights": jnp.zeros((4, 3072, 999))}}
    with caplog.at_level(logging.WARNING, logger="algonauts2025_tpu.parallel.sharding"):
        report = sharding_report(bad, mesh)
    assert report["sharded"] == 0
    assert any("does not divide model" in r.message for r in caplog.records)


def test_dp_matches_single_device():
    """One DP step over the mesh == the same step on one device."""
    mesh = get_mesh(n_devices=8, model_parallel=1)
    trainer_m, batch = _setup(mesh, b=8)
    trainer_m.init_state(batch, total_steps=2)
    trainer_s, _ = _setup(None, b=8)
    trainer_s.init_state(batch, total_steps=2)

    trainer_m._build_steps()
    trainer_s._build_steps()
    rng = jax.random.PRNGKey(1)
    sm, lm, _ = trainer_m._train_step(trainer_m.state, shard_batch(batch.data, mesh), rng)
    ss, ls, _ = trainer_s._train_step(trainer_s.state, shard_batch(batch.data, None), rng)
    assert float(lm) == pytest.approx(float(ls), rel=1e-5)
    # updated params agree across the mesh
    pm = jax.device_get(sm.params["time_pos_embed"])
    ps = jax.device_get(ss.params["time_pos_embed"])
    np.testing.assert_allclose(pm, ps, atol=1e-5)


def test_video_feature_extraction_shards_over_mesh():
    """Window batches shard over the "data" axis; outputs match the
    single-device path exactly (feature extraction scales like training)."""
    from algonauts2025_tpu.features.video import JaxVideoBackbone, TinyVideoBackbone

    mesh = get_mesh(n_devices=8, model_parallel=1)
    single = TinyVideoBackbone(hidden_size=32, num_layers=2, n_frames=4, crop_size=32)
    sharded = JaxVideoBackbone(
        single.model, single.params, n_frames=4, crop_size=32, mesh=mesh
    )
    rng = np.random.default_rng(0)
    windows = rng.integers(0, 255, (8, 4, 32, 32, 3), dtype=np.uint8)
    out_single = single.encode_windows(windows)
    out_sharded = sharded.encode_windows(windows)
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-5)
    dev = sharded.encode_windows_async(windows)
    assert "data" in str(dev.sharding.spec)
