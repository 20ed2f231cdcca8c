"""Decompose the flagship train step (round-3 VERDICT weak #7).

Measures, with the serializing-chain harness (axon dedupes repeated
identical executions — see CLAUDE.md):
- full train step (fwd + bwd under remat + Adam update)
- eval/forward-only step
- host->device batch transfer
and derives achieved MFU from the analytic trunk FLOP count.

Usage: python scripts/bench_train_accounting.py [batch ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (compile cache)
import numpy as np


def build(batch_size: int):
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
    return trainer, batch


def main() -> None:
    import jax

    batches = [int(a) for a in sys.argv[1:]] or [16]
    for b in batches:
        try:
            trainer, batch = build(b)
        except Exception as e:  # noqa: BLE001
            print(f"batch {b}: build failed: {type(e).__name__} {e}")
            continue
        from algonauts2025_tpu.parallel import shard_batch

        device_batch = shard_batch(batch.data, trainer.mesh)
        key = jax.random.PRNGKey(0)

        # the train step DONATES its input state: chain through the
        # returned state and never reuse trainer.state after the first call
        state, loss, _ = trainer._train_step(trainer.state, device_batch, key)
        float(np.asarray(loss))  # compile + sync

        def run_steps(state, n):
            loss = None
            for _ in range(n):
                state, loss, _ = trainer._train_step(state, device_batch, key)
            return state, float(np.asarray(loss))

        n = 10
        t0 = time.time(); state, _ = run_steps(state, n); t_step = (time.time() - t0) / n

        # forward only — chained inside ONE jit (repeated identical eval
        # dispatches get deduped by the axon runtime, CLAUDE.md)
        import jax.numpy as jnp

        model = trainer.model

        @jax.jit
        def chained_fwd(params, data):
            def body(_, c):
                d = dict(data)
                d["video"] = d["video"] + c  # serializing dependency
                out = model.apply({"params": params}, d, training=False)
                return out.astype(jnp.float32).mean() * 1e-30

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(jax.device_get(chained_fwd(state.params, device_batch)))
        t0 = time.time()
        float(jax.device_get(chained_fwd(state.params, device_batch)))
        t_fwd = (time.time() - t0) / n

        # H2D transfer of one batch
        t0 = time.time()
        for _ in range(3):
            db = shard_batch(batch.data, trainer.mesh)
            jax.block_until_ready(db["video"])
        t_h2d = (time.time() - t0) / 3

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(trainer.state.params)
        )
        tokens = b * 298
        fwd_tf = 2 * n_params * tokens / 1e12
        # remat: backward pays ~2x fwd matmuls + 1x recompute
        step_tf = 4 * fwd_tf
        print(
            f"batch {b}: step {t_step*1e3:.0f} ms  fwd {t_fwd*1e3:.0f} ms  "
            f"h2d {t_h2d*1e3:.0f} ms  params {n_params/1e9:.2f}B  "
            f"fwd {fwd_tf/t_fwd:.0f} TF/s ({fwd_tf/t_fwd/1.97:.0f}% MFU)  "
            f"step {step_tf/t_step:.0f} TF/s ({step_tf/t_step/1.97:.0f}% MFU)",
            flush=True,
        )
        del trainer
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
