"""Model-soup ensemble fan-out (reference grids/run_ensemble.py).

Samples ``n_randomly_sampled`` configs from the soup grid (layers, loss,
aggregation, dropout, subject embedding) and launches one run per config;
combine afterwards with grids.average_submissions.
"""

from __future__ import annotations

from ..config import ConfDict
from ..experiment import Experiment
from ..experiment.grid import run_grid
from .defaults import PROJECT_NAME, SAVEDIR, default_config

GRID_NAME = "model_soup"

update = {
    "infra": {
        "cluster": None,
        "folder": SAVEDIR,
        "job_name": PROJECT_NAME,
    },
    "wandb_config.group": GRID_NAME,
    "save_checkpoints": False,
    "seed": None,
    "patience": None,
}

grid = {
    "data.layers": [
        [0, 0.5, 1],
        [0.5, 0.75, 1.0],
        [0.5, 1.0],
        [0, 0.2, 0.4, 0.6, 0.8, 1.0],
    ],
    "loss.name": ["MSELoss", "PearsonLoss", "SmoothL1Loss", "HuberLoss"],
    "data.layer_aggregation": [None, "group_mean"],
    "brain_model_config.subject_embedding": [True, False],
    "brain_model_config.layer_aggregation": ["cat", "mean"],
    "brain_model_config.feature_aggregation": ["cat", "sum"],
    "brain_model_config.modality_dropout": [0.0, 0.2, 0.4],
}

N_MODELS = 1000


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
        n_randomly_sampled=N_MODELS,
        overwrite=False,
        dry_run=False,
        infra_mode="force",
    )
