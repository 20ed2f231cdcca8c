"""Optimizers and LR schedules (optax), with the reference config surface.

Rebuild of reference modeling_utils/optimizers/base.py: the
optimizer/scheduler names and kwargs of the torch configs are preserved
("Adam" + OneCycleLR etc., defaults.py:126-141) but build optax
transformations.  SWA's annealing phase (Lightning SWALR, reference
main.py:365-373) is composed into the schedule here: from the SWA start
step the LR cosine-anneals to ``swa_lr`` and stays there.
"""

from __future__ import annotations

import math
import typing as tp

import optax
import pydantic

__all__ = ["OptimizerConfig", "SchedulerConfig", "OptimConfig"]


class OptimizerConfig(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="forbid")
    name: str = "Adam"
    lr: float
    kwargs: dict[str, tp.Any] = {}

    def build(self, schedule: optax.Schedule | float) -> optax.GradientTransformation:
        kw = dict(self.kwargs)
        weight_decay = kw.pop("weight_decay", 0.0)
        b1, b2 = kw.pop("betas", (0.9, 0.999))
        eps = kw.pop("eps", 1e-8)
        momentum = kw.pop("momentum", 0.0)
        # HBM saver for billion-param training on 16 GB chips
        mu_dtype = kw.pop("mu_dtype", None)
        if kw:
            raise ValueError(f"Unsupported optimizer kwargs: {list(kw)}")
        name = self.name
        if name in ("Adam", "AdamW"):
            if weight_decay and name == "Adam":
                # torch Adam applies L2 to the gradient (not decoupled)
                return optax.chain(
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype),
                    optax.scale_by_learning_rate(schedule),
                )
            if name == "AdamW":
                return optax.adamw(
                    schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                    mu_dtype=mu_dtype,
                )
            return optax.adam(schedule, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)
        def decayed(tx: optax.GradientTransformation) -> optax.GradientTransformation:
            # torch applies weight_decay as an L2 term added to the raw
            # gradient (before momentum/preconditioning) — never drop it
            if not weight_decay:
                return tx
            return optax.chain(optax.add_decayed_weights(weight_decay), tx)

        if name == "SGD":
            return decayed(optax.sgd(schedule, momentum=momentum or None))
        if name == "Adagrad":
            return decayed(optax.adagrad(schedule))
        if name == "RMSprop":
            return decayed(optax.rmsprop(schedule, momentum=momentum))
        if name == "Lion":
            return optax.lion(schedule, weight_decay=weight_decay)
        # remaining torch.optim family members with optax equivalents
        simple = {
            "Adamax": lambda: optax.adamax(schedule, b1=b1, b2=b2, eps=eps),
            "NAdam": lambda: optax.nadam(schedule, b1=b1, b2=b2, eps=eps),
            "RAdam": lambda: optax.radam(schedule, b1=b1, b2=b2, eps=eps),
            "Adadelta": lambda: optax.adadelta(schedule),
            "Adafactor": lambda: optax.adafactor(schedule),
            "LAMB": lambda: optax.lamb(schedule, b1=b1, b2=b2, eps=eps,
                                       weight_decay=weight_decay),
        }
        if name in simple:
            return decayed(simple[name]()) if name != "LAMB" else simple[name]()
        raise ValueError(f"Unknown optimizer: {name} (use one of "
                         f"Adam/AdamW/SGD/Adagrad/RMSprop/Lion/{'/'.join(simple)})")


class SchedulerConfig(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="forbid")
    name: str = "OneCycleLR"
    kwargs: dict[str, tp.Any] = {}

    def build(self, base_lr: float, total_steps: int) -> optax.Schedule:
        kw = dict(self.kwargs)

        def _reject_leftovers() -> None:
            # torch silently honors scheduler kwargs; dropping one here
            # silently trains a DIFFERENT LR trajectory (same defect class
            # as the r2 optimizer-kwarg fix), so unknown keys fail loudly
            if kw:
                raise ValueError(
                    f"Unsupported {self.name} scheduler kwargs: "
                    f"{sorted(kw)} (supported keys were consumed; check "
                    "spelling / port the missing behavior explicitly)"
                )

        if self.name == "OneCycleLR":
            # hand-rolled (optax's onecycle NaNs when a phase rounds to zero
            # steps, e.g. smoke runs with 4 total steps and pct_start=0.1)
            import jax.numpy as jnp

            max_lr = kw.pop("max_lr", base_lr)
            pct_start = kw.pop("pct_start", 0.3)
            div_factor = kw.pop("div_factor", 25.0)
            final_div_factor = kw.pop("final_div_factor", 1e4)
            _reject_leftovers()
            total = max(2, total_steps)
            warmup = min(max(1, round(total * pct_start)), total - 1)
            init = max_lr / div_factor
            final = init / final_div_factor

            def schedule(step):
                step = jnp.minimum(step, total)
                up = jnp.clip(step / warmup, 0.0, 1.0)
                lr_up = init + (max_lr - init) * 0.5 * (1 - jnp.cos(jnp.pi * up))
                down = jnp.clip((step - warmup) / (total - warmup), 0.0, 1.0)
                lr_down = final + (max_lr - final) * 0.5 * (1 + jnp.cos(jnp.pi * down))
                return jnp.where(step < warmup, lr_up, lr_down)

            return schedule
        if self.name == "CosineAnnealingLR":
            t_max = kw.pop("T_max", total_steps)
            eta_min = kw.pop("eta_min", 0.0)
            _reject_leftovers()
            return optax.cosine_decay_schedule(
                base_lr, decay_steps=max(1, t_max), alpha=eta_min / base_lr if base_lr else 0.0
            )
        if self.name == "StepLR":
            step_size = kw.pop("step_size")
            gamma = kw.pop("gamma", 0.1)
            _reject_leftovers()
            return lambda step: base_lr * gamma ** (step // step_size)
        if self.name == "LinearLR":
            start_factor = kw.pop("start_factor", 1 / 3)
            end_factor = kw.pop("end_factor", 1.0)
            total = kw.pop("total_iters", 5)
            _reject_leftovers()
            return optax.linear_schedule(
                base_lr * start_factor, base_lr * end_factor, total
            )
        raise ValueError(f"Unknown scheduler: {self.name}")


def _with_swa_annealing(
    schedule: optax.Schedule,
    swa_start_step: int,
    swa_lr: float,
    annealing_steps: int,
) -> optax.Schedule:
    """After swa_start_step, cosine-anneal from the pre-SWA LR to swa_lr."""
    import jax.numpy as jnp

    def fn(step):
        base = schedule(jnp.minimum(step, swa_start_step))
        frac = jnp.clip((step - swa_start_step) / max(1, annealing_steps), 0.0, 1.0)
        annealed = swa_lr + (base - swa_lr) * 0.5 * (1 + jnp.cos(math.pi * frac))
        return jnp.where(step < swa_start_step, schedule(step), annealed)

    return fn


class OptimConfig(pydantic.BaseModel):
    """The reference's LightningOptimizerConfig surface (optimizers/base.py:78-96)."""

    model_config = pydantic.ConfigDict(extra="forbid")
    name: tp.Literal["LightningOptimizer"] = "LightningOptimizer"
    optimizer: OptimizerConfig
    scheduler: SchedulerConfig | None = None
    interval: tp.Literal["step", "epoch"] = "step"

    def build(
        self,
        total_steps: int,
        swa_start_step: int | None = None,
        swa_lr: float = 1e-5,
        steps_per_epoch: int | None = None,
    ) -> tuple[optax.GradientTransformation, optax.Schedule]:
        base_lr = self.optimizer.lr
        if self.scheduler is not None:
            if self.interval == "epoch":
                # torch semantics: scheduler.step() once per epoch — the
                # schedule is built in epoch units and advanced every
                # steps_per_epoch optimizer steps
                if steps_per_epoch is None:
                    raise ValueError(
                        "interval='epoch' requires steps_per_epoch"
                    )
                spe = max(1, steps_per_epoch)
                n_epochs = max(1, total_steps // spe)
                inner = self.scheduler.build(base_lr, n_epochs)
                schedule = lambda step: inner(step // spe)  # noqa: E731
            else:
                schedule = self.scheduler.build(base_lr, total_steps)
        else:
            schedule = optax.constant_schedule(base_lr)
        if swa_start_step is not None and swa_start_step < total_steps:
            schedule = _with_swa_annealing(
                schedule, swa_start_step, swa_lr, total_steps - swa_start_step
            )
        tx = self.optimizer.build(schedule)
        return tx, schedule
