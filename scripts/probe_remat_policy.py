"""A/B the trunk remat policy at flagship shapes (r4 verdict directive 6).

r2b measured selective remat (save attn_out) OOMing by 139 MB; the r4
InfoNCE rewrite freed ~91 MB of step HBM, so re-try at HEAD.  Runs the
flagship train step (batch 16 trimodal, 0.9B params, bf16 Adam mu,
contrastive) under each policy and reports s/step or OOM.

Usage: python scripts/probe_remat_policy.py [batch]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (compile cache)
import numpy as np


def run(policy: str | None, batch_size: int) -> None:
    import jax

    from algonauts2025_tpu.data.dataset import SegmentData
    from algonauts2025_tpu.models import FmriEncoderConfig
    from algonauts2025_tpu.parallel import get_mesh, shard_batch
    from algonauts2025_tpu.training import (
        BrainTrainer,
        OptimConfig,
        TrainerConfig,
        build_loss,
    )

    cfg = FmriEncoderConfig(
        n_subjects=4,
        modality_dropout=0.3,
        remat=True,
        remat_policy=policy,
        contrastive_enabled=True,
        contrastive_modalities=["video"],
    )
    feature_dims = {"text": (2, 3072), "audio": (2, 1024), "video": (2, 1408)}
    model = cfg.build(feature_dims, n_outputs=1000, n_output_timesteps=100)
    b, t = batch_size, 298
    rng = np.random.default_rng(0)
    data = {
        m: rng.standard_normal((b, l, d, t)).astype(np.float32)
        for m, (l, d) in feature_dims.items()
    }
    data["subject_id"] = rng.integers(0, 4, size=(b, 1))
    data["fmri"] = rng.standard_normal((b, 1000, 100)).astype(np.float32)
    batch = SegmentData(data=data, segments=[None] * b)
    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(
            optimizer={
                "name": "Adam",
                "lr": 1e-4,
                "kwargs": {"weight_decay": 0.0, "mu_dtype": "bfloat16"},
            },
            scheduler={"name": "OneCycleLR", "kwargs": {"max_lr": 1e-4, "pct_start": 0.1}},
        ),
        metrics={},
        config=TrainerConfig(
            n_epochs=1, folder=None, save_checkpoints=False, seed=0,
            contrastive_weight=0.1,
        ),
        mesh=get_mesh(),
    )
    trainer.init_state(batch, total_steps=100)
    trainer._build_steps()
    device_batch = shard_batch(batch.data, trainer.mesh)
    key = jax.random.PRNGKey(0)
    try:
        state, loss, _ = trainer._train_step(trainer.state, device_batch, key)
        float(np.asarray(loss))  # compile + sync
        n = 10
        t0 = time.time()
        for _ in range(n):
            state, loss, _ = trainer._train_step(state, device_batch, key)
        final = float(np.asarray(loss))
        dt = (time.time() - t0) / n
        print(f"policy={policy!r} batch={b}: {dt*1e3:.1f} ms/step (loss {final:.4f})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"policy={policy!r} batch={b}: FAILED {type(e).__name__}: {msg}",
              flush=True)
    finally:
        del trainer
        gc.collect()


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    for policy in (None, "save_attn_out"):
        run(policy, b)
