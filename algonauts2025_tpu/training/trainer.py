"""The training engine: jit'd steps, SWA, early stopping, checkpoints.

Replaces PyTorch Lightning (reference algonauts2025/pl_module.py +
Trainer wiring in main.py:357-414) with a functional JAX loop:

- one compiled train step (grad + optax update + EMA-free SWA slot),
  donated state, dropout/modality rngs threaded explicitly;
- SWA as a running mean of params accumulated ON HOST at epoch
  boundaries from 60% of training (a device slot would be a 4th-5th copy
  of the params: the 0.9B flagship + Adam already fills a 16 GB chip), LR
  annealed to swa_lr inside the optax schedule (reference main.py:365-373);
- streaming metrics (training.metrics) updated on device per eval batch;
- orbax checkpoints (best on monitor / last, reference main.py:374-385)
  including optimizer and SWA state for exact resume;
- optional Mesh: params replicated, batch sharded over the "data" axis,
  XLA inserting the gradient all-reduce (no DDP process groups).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.dataset import SegmentData
from ..parallel.mesh import shard_batch
from .metrics import Metric, MetricNeverUpdated
from .optim import OptimConfig

logger = logging.getLogger(__name__)

__all__ = ["TrainState", "BrainTrainer", "TrainerConfig"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: tp.Any
    opt_state: tp.Any


@functools.partial(jax.jit, static_argnames=("n_rep",))
def _jit_groups(subject_ids, n_rep):
    """(B, 1) ids -> flat segment groups and per-voxel-row groups in one
    jitted dispatch (eager per-batch device ops are pathologically slow
    on remotely attached chips)."""
    seg = subject_ids.reshape(-1)
    return seg, jnp.repeat(seg, n_rep)


@jax.jit
def _jit_time_mean(x):
    """Jitted (B, D, T) -> (B, D) mean (eager per-batch device ops are
    pathologically slow on remotely attached chips)."""
    return x.mean(axis=-1)


@dataclasses.dataclass
class TrainerConfig:
    n_epochs: int = 10
    monitor: str = "val/pearson"
    monitor_mode: str = "max"
    patience: int | None = None
    swa_start: float = 0.6  # fraction of epochs before SWA begins
    swa_lr: float = 1e-5
    swa_enabled: bool = True
    contrastive_weight: float = 0.0
    limit_train_batches: int | None = None
    log_every_n_steps: int | None = None
    save_checkpoints: bool = True
    folder: str | Path | None = None
    seed: int = 33
    fast_dev_run: bool = False


class BrainTrainer:
    """Functional trainer for FmriEncoder-style models.

    ``model.apply`` contract: apply(variables, batch_dict, training=...)
    returns (B, O, T') predictions; ``method="forward_with_contrastive"``
    additionally returns a dict of contrastive losses.
    """

    def __init__(
        self,
        model: tp.Any,
        loss_fn: tp.Callable[[jax.Array, jax.Array], jax.Array],
        optim_config: OptimConfig,
        metrics: tp.Mapping[str, Metric],
        config: TrainerConfig,
        mesh: tp.Any | None = None,
        callbacks: tp.Sequence[tp.Any] = (),
    ) -> None:
        self.model = model
        self.loss_fn = loss_fn
        self.optim_config = optim_config
        self.metrics = dict(metrics)
        self.config = config
        self.mesh = mesh
        self.callbacks = list(callbacks)
        self.tx: optax.GradientTransformation | None = None
        self.schedule: optax.Schedule | None = None
        self._schedule_jit: tp.Callable | None = None
        self.state: TrainState | None = None
        self.history: list[dict[str, float]] = []
        self.callback_metrics: dict[str, float] = {}
        self._train_step = None
        self._eval_step = None
        self._has_contrastive = hasattr(model, "forward_with_contrastive")
        self._logger: tp.Any = None
        self._swa_params: tp.Any = None
        self._swa_count: int = 0
        self._best: float | None = None  # monitor state, persisted in ckpts
        self._bad_epochs: int = 0

    @property
    def batch_sharding(self):
        """NamedSharding for input batches (None off-mesh): loaders that
        prefetch with it avoid a second full-batch placement per step."""
        if self.mesh is None:
            return None
        from ..parallel.mesh import batch_sharding

        return batch_sharding(self.mesh)

    # -- initialization ---------------------------------------------------
    def init_state(self, example_batch: SegmentData, total_steps: int) -> TrainState:
        cfg = self.config
        swa_start_step = (
            int(total_steps * cfg.swa_start) if cfg.swa_enabled else None
        )
        self.tx, self.schedule = self.optim_config.build(
            total_steps,
            swa_start_step=swa_start_step,
            swa_lr=cfg.swa_lr,
            steps_per_epoch=max(1, total_steps // max(1, cfg.n_epochs)),
        )
        rng = jax.random.PRNGKey(cfg.seed)
        batch = {k: jnp.asarray(v) for k, v in example_batch.data.items()}
        init_kwargs: dict[str, tp.Any] = {}
        if self._has_contrastive:
            # touch the contrastive heads so their params exist
            init_kwargs["method"] = "forward_with_contrastive"

        # everything under one jit: eager dispatch is pathologically slow on
        # remotely-attached devices (each primitive is a round trip)
        def _init(rng, batch):
            variables = self.model.init(
                {"params": rng, "dropout": rng, "modality": rng},
                batch,
                training=False,
                **init_kwargs,
            )
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=self.tx.init(params),
            )

        if self.mesh is not None:
            # annotate param shardings (replicated for pure DP; large
            # weights split over the "model" axis when it exists) and let
            # XLA SPMD insert the collectives
            from ..parallel.sharding import state_shardings

            abstract = jax.eval_shape(_init, rng, batch)
            shardings = state_shardings(abstract, self.mesh)
            state = jax.jit(_init, out_shardings=shardings)(rng, batch)
        else:
            state = jax.jit(_init)(rng, batch)
        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        logger.info("Total parameters: %d", n_params)
        self.state = state
        return state

    # -- compiled steps ---------------------------------------------------
    def _build_steps(self) -> None:
        cfg = self.config
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        has_contrastive = self._has_contrastive

        def compute_loss(params, batch, rngs):
            y_true = batch["fmri"]  # (B, O, T)
            if has_contrastive:
                y_pred, closses = model.apply(
                    {"params": params},
                    batch,
                    training=True,
                    rngs=rngs,
                    method="forward_with_contrastive",
                )
            else:
                y_pred = model.apply(
                    {"params": params}, batch, training=True, rngs=rngs
                )
                closses = {}
            # flatten (b, d, t) -> ((b t), d) like the reference step
            yp = jnp.swapaxes(y_pred, 1, 2).reshape(-1, y_pred.shape[1])
            yt = jnp.swapaxes(y_true, 1, 2).reshape(-1, y_true.shape[1])
            loss = loss_fn(yp, yt)
            if closses:
                total_c = sum(closses.values()) / max(1, len(closses))
                loss = loss + cfg.contrastive_weight * total_c
            return loss, {k: v for k, v in closses.items()}

        def train_step(state: TrainState, batch, rng):
            rngs = {
                "dropout": jax.random.fold_in(rng, state.step),
                "modality": jax.random.fold_in(jax.random.fold_in(rng, 1), state.step),
            }
            (loss, aux), grads = jax.value_and_grad(compute_loss, has_aux=True)(
                state.params, batch, rngs
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params, opt_state=opt_state),
                loss,
                aux,
            )

        def eval_step(params, batch):
            y_pred = model.apply({"params": params}, batch, training=False)
            return y_pred

        def eval_step_with_loss(params, batch):
            """Predictions + flattened views + loss, all in one executable
            (eager per-batch loss math is a round trip per primitive on
            remotely-attached devices)."""
            y_pred = model.apply({"params": params}, batch, training=False)
            y_true = batch["fmri"]
            yp = jnp.swapaxes(y_pred, 1, 2).reshape(-1, y_pred.shape[1])
            yt = jnp.swapaxes(y_true, 1, 2).reshape(-1, y_true.shape[1])
            return y_pred, yp, yt, loss_fn(yp, yt)

        donate = (0,)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)
        self._eval_step_with_loss = jax.jit(eval_step_with_loss)

    def _swa_merge(self, host_params: tp.Any = None) -> None:
        """Host-side running mean of params (exact fp32, zero HBM cost).

        ``host_params``: an already-fetched host copy of the params — the
        epoch checkpoint fetch provides it so the merge doesn't pay a
        second full-params D2H transfer on the slow tunnel."""
        params = host_params if host_params is not None else jax.device_get(self.state.params)
        if self._swa_params is None:
            self._swa_params = params
            self._swa_count = 1
            return
        n = float(self._swa_count)
        self._swa_params = jax.tree.map(
            lambda avg, p: (avg * n + p) / (n + 1.0), self._swa_params, params
        )
        self._swa_count += 1

    # -- training loop ----------------------------------------------------
    def fit(
        self,
        train_loader_fn: tp.Callable[[int], tp.Iterable[SegmentData]],
        val_loader_fn: tp.Callable[[], tp.Iterable[SegmentData]],
        start_epoch: int = 0,
    ) -> None:
        cfg = self.config
        assert self.state is not None, "call init_state first"
        if self._train_step is None:
            self._build_steps()
        rng = jax.random.PRNGKey(cfg.seed + 1)
        swa_start_epoch = int(cfg.n_epochs * cfg.swa_start)

        # resumed runs continue the monitor/patience state from the
        # checkpoint: a fresh best=-inf would let a worse post-resume
        # epoch clobber best.ckpt (Lightning restores this state too)
        best = self._best
        if best is None:
            best = -np.inf if cfg.monitor_mode == "max" else np.inf
        bad_epochs = self._bad_epochs
        n_epochs = 1 if cfg.fast_dev_run else cfg.n_epochs
        last_host_state = None  # latest per-epoch host fetch (final SWA save reuses it)

        for epoch in range(start_epoch, n_epochs):
            for cb in self.callbacks:
                if hasattr(cb, "on_train_epoch_start"):
                    cb.on_train_epoch_start(self, epoch)
            t0 = time.time()
            losses = []
            for i, batch in enumerate(train_loader_fn(epoch)):
                if cfg.limit_train_batches is not None and i >= cfg.limit_train_batches:
                    break
                if cfg.fast_dev_run and i >= 1:
                    break
                data = shard_batch(batch.data, self.mesh)
                self.state, loss, _aux = self._train_step(self.state, data, rng)
                losses.append(loss)
                if (
                    cfg.log_every_n_steps
                    and (i + 1) % cfg.log_every_n_steps == 0
                ):
                    logger.info(
                        "epoch %d step %d: train/loss=%.5f",
                        epoch,
                        i,
                        float(loss),
                    )
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            # (the SWA epoch-boundary merge happens below, after the
            # checkpoint host fetch, so one D2H transfer serves both —
            # validation does not change params, so the values are the same)

            # validation
            val_metrics = self.evaluate(val_loader_fn(), split="val")
            lr = self._current_lr()
            record = {
                "epoch": epoch,
                "train/loss": train_loss,
                "lr": lr,
                "epoch_seconds": time.time() - t0,
                **val_metrics,
            }
            self.history.append(record)
            self.callback_metrics.update(
                {k: v for k, v in record.items() if isinstance(v, (int, float))}
            )
            if self._logger is not None:
                self._logger.log(record, step=int(self.state.step))
            logger.info(
                "epoch %d: loss=%.5f %s lr=%.2e (%.1fs)",
                epoch,
                train_loss,
                " ".join(
                    f"{k}={v:.4f}" for k, v in val_metrics.items() if isinstance(v, float)
                ),
                lr,
                record["epoch_seconds"],
            )

            if not val_metrics:
                raise RuntimeError(
                    "validation produced no batches/metrics — an empty val "
                    "split would silently disable best-checkpointing and "
                    "let patience stop training"
                )
            monitored = val_metrics.get(cfg.monitor)
            if monitored is None and val_metrics:
                # a missing monitor key must be loud: treating it as "no
                # improvement" would silently skip best.ckpt and let
                # patience stop training regardless of actual progress
                raise KeyError(
                    f"monitor {cfg.monitor!r} not in validation metrics "
                    f"{sorted(val_metrics)}; set TrainerConfig.monitor to one "
                    "of these (grouped metrics log per-group keys like "
                    "'val/pearson/0' plus the mean under their log_name)"
                )
            improved = monitored is not None and (
                monitored > best if cfg.monitor_mode == "max" else monitored < best
            )
            # one host fetch serves "best", "last", AND the SWA merge;
            # skip it entirely when checkpointing is disabled (no folder)
            host_state = None
            if self.state is not None and (
                self._ckpt_dir("best") is not None or self._ckpt_dir("last") is not None
            ):
                host_state = jax.device_get(self.state)
            last_host_state = host_state
            if cfg.swa_enabled and epoch >= swa_start_epoch:
                self._swa_merge(
                    host_params=None if host_state is None else host_state.params
                )
            if improved:
                best = monitored
                bad_epochs = 0
                self._best, self._bad_epochs = best, bad_epochs
                self.save_checkpoint("best", host_state=host_state)
            else:
                bad_epochs += 1
            self._best, self._bad_epochs = best, bad_epochs
            self.save_checkpoint("last", epoch=epoch, host_state=host_state)
            # Lightning EarlyStopping stops after `patience` consecutive
            # non-improving validations (wait_count >= patience)
            if cfg.patience is not None and bad_epochs >= cfg.patience:
                logger.info("Early stopping at epoch %d", epoch)
                break

        # adopt SWA weights at the end of training (Lightning parity).
        # After a resume that runs zero epochs the restored params can be
        # plain numpy (no .sharding) — place the SWA slot plainly then.
        if cfg.swa_enabled and self._swa_count > 0:
            sample = jax.tree_util.tree_leaves(self.state.params)
            if sample and hasattr(sample[0], "sharding"):
                swa = jax.device_put(
                    self._swa_params,
                    jax.tree.map(lambda p: p.sharding, self.state.params),
                )
            else:
                swa = jax.device_put(self._swa_params)
            self.state = self.state.replace(params=swa)
            # reuse the last epoch's host fetch (opt state/step unchanged
            # since) with the host-resident SWA params swapped in — a
            # fresh device_get of the full state here would re-pay the
            # whole multi-GB D2H transfer for bytes we already hold
            final_host = (
                last_host_state.replace(params=self._swa_params)
                if last_host_state is not None
                else None
            )
            self.save_checkpoint("last", epoch=n_epochs - 1, host_state=final_host)

    def _current_lr(self) -> float:
        """Schedule value at the current step, evaluated under ONE jit
        dispatch (optax schedules are jnp compositions — eager evaluation
        costs several ~0.4 s device round trips per epoch on remotely
        attached chips, CLAUDE.md)."""
        if self.schedule is None:
            return 0.0
        if self._schedule_jit is None:
            self._schedule_jit = jax.jit(self.schedule)
        return float(jax.device_get(self._schedule_jit(self.state.step)))

    # -- evaluation -------------------------------------------------------
    def evaluate(
        self, loader: tp.Iterable[SegmentData], split: str = "val"
    ) -> dict[str, float]:
        assert self.state is not None
        if self._eval_step is None:
            self._build_steps()
        for name, metric in self.metrics.items():
            if name.startswith(split):
                metric.reset()
        losses = []
        n = 0
        # loop-invariant: which of this split's metrics want group ids
        needs_groups = any(
            m.needs_groups or m.is_retrieval
            for name, m in self.metrics.items()
            if name.startswith(split)
        )
        for batch in loader:
            data = shard_batch(batch.data, self.mesh)
            y_pred, yp, yt, loss = self._eval_step_with_loss(self.state.params, data)
            y_true = data["fmri"]
            losses.append(loss)
            subject_ids = data.get("subject_id")
            voxel_groups = None
            segment_groups = None
            if subject_ids is not None and needs_groups:
                # one jitted dispatch; eager reshape+repeat per batch cost
                # round trips on remotely attached chips
                segment_groups, voxel_groups = _jit_groups(
                    subject_ids, y_pred.shape[2]
                )
            retrieval_args = None  # time-means computed once per batch
            for name, metric in self.metrics.items():
                if not name.startswith(split):
                    continue
                # dispatch on capability flags (Metric.is_retrieval /
                # .needs_groups), never on class names
                if metric.is_retrieval:
                    if retrieval_args is None:
                        retrieval_args = (
                            _jit_time_mean(y_pred),
                            _jit_time_mean(y_true),
                        )
                    args = retrieval_args
                    groups = segment_groups
                else:
                    args = (yp, yt)
                    groups = voxel_groups
                if metric.needs_groups:
                    metric.update(*args, groups=groups)
                else:
                    metric.update(*args)
            n += 1
        out: dict[str, float] = {}
        if n:
            # single D2H transfer (a float() per batch is a round trip each
            # on remotely-attached chips)
            out[f"{split}/loss"] = float(jnp.mean(jnp.stack(losses)))
        for name, metric in self.metrics.items():
            if not name.startswith(split):
                continue
            try:
                value = metric.compute()
            except MetricNeverUpdated:
                continue  # metric never updated (empty split); any other
                # compute failure propagates — a broken metric must be loud
            if isinstance(value, dict):
                for k, v in value.items():
                    out[f"{name}/{k}"] = v
                if value and name not in out:
                    # also expose the group mean under the base name so a
                    # grouped metric can be monitored directly
                    # nanmean: a single-row group reports NaN by design
                    # (GroupedPearson); it must not poison the monitorable
                    # group mean
                    out[name] = float(np.nanmean(list(value.values())))
            else:
                out[name] = value
        return out

    def predict(
        self, loader: tp.Iterable[SegmentData]
    ) -> tp.Iterator[tuple[np.ndarray, SegmentData]]:
        assert self.state is not None
        if self._eval_step is None:
            self._build_steps()
        for batch in loader:
            data = shard_batch(batch.data, self.mesh)
            y_pred = self._eval_step(self.state.params, data)
            yield np.asarray(y_pred), batch

    # -- checkpointing ----------------------------------------------------
    def _ckpt_dir(self, name: str) -> Path | None:
        if self.config.folder is None or not self.config.save_checkpoints:
            return None
        return Path(self.config.folder) / f"{name}.ckpt"

    def save_checkpoint(
        self, name: str, epoch: int | None = None, host_state: tp.Any = None
    ) -> None:
        """``host_state``: an already-fetched host copy of ``self.state`` —
        an improving epoch writes "best" then "last", and a second
        device_get of the full params+optimizer state (~GBs) over a slow
        D2H link must not be paid twice."""
        path = self._ckpt_dir(name)
        if path is None or self.state is None:
            return
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            meta = {"epoch": epoch if epoch is not None else -1,
                    "swa_count": self._swa_count,
                    "best": float(self._best) if self._best is not None else float("nan"),
                    "bad_epochs": self._bad_epochs}
            if host_state is None:
                host_state = jax.device_get(self.state)
            payload = {"state": host_state, "meta": meta}
            if self._swa_params is not None:
                payload["swa_params"] = self._swa_params
            ckptr.save(path.resolve(), payload, force=True)

    def load_checkpoint(
        self, path: str | Path, strict: bool = True, params_only: bool = False
    ) -> int:
        """Restore state; returns the next epoch to run.

        ``params_only`` adopts only the model weights (warm start, matching
        the reference's ``load_from_checkpoint(strict=False)``): the fresh
        optimizer state, schedule position, and SWA slots are kept, so the
        new run trains its own LR trajectory instead of resuming the old
        run's final/SWA learning rate.
        """
        import orbax.checkpoint as ocp

        assert self.state is not None, "init_state before load_checkpoint"
        if params_only:
            # warm start: restore WITHOUT a state template — the source
            # run's optimizer/schedule structure is irrelevant (and a
            # different optax chain would crash a templated restore even
            # though only the weights are wanted)
            with ocp.StandardCheckpointer() as ckptr:
                try:
                    raw = ckptr.restore(Path(path).resolve())
                except Exception:
                    if strict:
                        raise
                    logger.warning("Non-strict checkpoint load failed for %s", path)
                    return 0
            cur = self.state.params
            new_params = raw["state"]["params"]
            cur_flat = dict(jax.tree_util.tree_flatten_with_path(cur)[0])
            new_flat = dict(jax.tree_util.tree_flatten_with_path(new_params)[0])
            missing = set(cur_flat) - set(new_flat)
            mismatched = {
                kp
                for kp in set(cur_flat) & set(new_flat)
                if np.shape(new_flat[kp]) != cur_flat[kp].shape
            }
            if (missing or mismatched) and strict:
                raise ValueError(
                    f"Checkpoint {path}: {len(missing)} model parameters "
                    f"missing, {len(mismatched)} shape-mismatched "
                    f"(e.g. {sorted(map(str, missing | mismatched))[:3]}); "
                    "pass strict=False to adopt the intersection "
                    "(reference load_from_checkpoint(strict=False))"
                )

            def adopt(kp, old):
                new = new_flat.get(kp)
                if new is None or np.shape(new) != old.shape:
                    return old  # strict=False: keep fresh init for misses
                return (
                    jax.device_put(jnp.asarray(new), old.sharding)
                    if hasattr(old, "sharding")
                    else jnp.asarray(new)
                )

            params = jax.tree_util.tree_map_with_path(adopt, cur)
            self.state = self.state.replace(params=params)
            return 0
        template = {
            "state": jax.device_get(self.state),
            "meta": {
                "epoch": -1,
                "swa_count": 0,
                "best": float("nan"),
                "bad_epochs": 0,
            },
        }
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(Path(path).resolve(), template)
            except Exception:
                try:  # checkpoints that carry an SWA slot
                    template["swa_params"] = jax.device_get(self.state.params)
                    restored = ckptr.restore(Path(path).resolve(), template)
                except Exception:
                    if strict:
                        raise
                    logger.warning("Non-strict checkpoint load failed for %s", path)
                    return 0
        state = restored["state"]
        if self.mesh is not None:
            from ..parallel.sharding import state_shardings

            state = jax.device_put(state, state_shardings(state, self.mesh))
        self.state = state
        if "swa_params" in restored:
            self._swa_params = restored["swa_params"]
        self._swa_count = int(restored["meta"].get("swa_count", 0))
        restored_best = float(restored["meta"].get("best", float("nan")))
        self._best = None if np.isnan(restored_best) else restored_best
        self._bad_epochs = int(restored["meta"].get("bad_epochs", 0))
        return int(restored["meta"]["epoch"]) + 1
