"""Hyperparameter grid sweep (reference grids/run_grid.py).

Layers x seed sweep fanned out as a task array; set
``infra.cluster="external"`` + ALGONAUTS_TPU_LAUNCHER for one TPU slice
per config.
"""

from __future__ import annotations

from ..config import ConfDict
from ..experiment import Experiment
from ..experiment.grid import run_grid
from .defaults import PROJECT_NAME, SAVEDIR, default_config

GRID_NAME = "grid"

update = {
    "infra": {
        "cluster": None,
        "folder": SAVEDIR,
        "job_name": PROJECT_NAME,
    },
    "wandb_config.group": GRID_NAME,
    "save_checkpoints": False,
}

grid = {
    "data.layers": [
        [0, 0.5, 1],
        [0.5, 0.75, 1.0],
        [0.5, 1.0],
        [0, 0.2, 0.4, 0.6, 0.8, 1.0],
    ],
    "seed": list(range(5)),
}


if __name__ == "__main__":
    updated_config = ConfDict(default_config)
    updated_config.update(update)
    out = run_grid(
        Experiment,
        GRID_NAME,
        updated_config.to_dict(),
        grid,
        job_name_keys=["wandb_config.name", "infra.job_name"],
        combinatorial=True,
        overwrite=False,
        dry_run=False,
        infra_mode="force",
    )
