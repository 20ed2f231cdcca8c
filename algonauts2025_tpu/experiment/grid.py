"""Grid fan-out: config product -> uid folders -> task array.

Rebuild of reference modeling_utils/utils.py:76-160 (run_grid).  The Slurm
job array becomes a TaskInfra job array: in-process / threadpool locally,
or one TPU-slice job per config via the external launcher hook
(cache.task_cache.TaskInfra._launch_external).
"""

from __future__ import annotations

import logging
import random
import shutil
import typing as tp
from itertools import product
from pathlib import Path

from ..config.confdict import ConfDict

logger = logging.getLogger(__name__)

__all__ = ["run_grid"]


def run_grid(
    exp_cls: type,
    exp_name: str,
    base_config: dict[str, tp.Any],
    grid: dict[str, list],
    n_randomly_sampled: int | None = None,
    job_name_keys: list[str] | None = None,
    combinatorial: bool = False,
    overwrite: bool = False,
    dry_run: bool = False,
    infra_mode: str = "retry",
    seed: int | None = None,
    interactive: bool = True,
) -> list[ConfDict]:
    """Launch one experiment per grid point; returns the configs."""
    base = ConfDict(base_config)
    base["infra.job_name"] = exp_name
    base_config = base.to_dict()  # per-task configs inherit the job name
    base_folder = Path(base["infra"]["folder"])
    assert all(isinstance(v, list) for v in grid.values()), "Grid values must be lists."

    if combinatorial:
        grid_product = [dict(zip(grid.keys(), v)) for v in product(*grid.values())]
    else:
        grid_product = [
            {param: value} for param, values in grid.items() for value in values
        ]
    if n_randomly_sampled is not None:
        assert n_randomly_sampled <= len(grid_product), (
            "n_randomly_sampled must be <= the number of grid points"
        )
        rng = random.Random(seed)
        grid_product = rng.sample(grid_product, n_randomly_sampled)

    logger.info("Launching %d tasks", len(grid_product))

    def _expand(params: dict) -> ConfDict | None:
        job_name = ConfDict(params).to_uid()
        config = ConfDict(base_config)
        config.update(params)
        folder = base_folder / exp_name / job_name
        if folder.exists():
            logger.info("%s already exists.", folder)
            if overwrite and not dry_run:
                if interactive:
                    print(f"Folder {folder} exists. Overwrite? (y/n)")
                    if input().lower() != "y":
                        return None
                shutil.rmtree(folder)
                folder.mkdir()
        config["infra.folder"] = str(folder)
        config["infra.mode"] = infra_mode
        for key in job_name_keys or []:
            config.update({key: str(job_name)})
        return config

    if dry_run:
        # enumerate configs without instantiating experiments (no data access)
        out_configs = [c for c in map(_expand, grid_product) if c is not None]
        logger.info("Dry run: %d configs.", len(out_configs))
        return out_configs

    template = exp_cls(**ConfDict(base_config).to_dict())
    template.infra.mode = infra_mode
    out_configs = []
    with template.infra.job_array() as tasks:
        for params in grid_product:
            config = _expand(params)
            if config is None:
                continue
            tasks.append(exp_cls(**config.to_dict()))
            out_configs.append(config)
    logger.info("Done.")
    return out_configs
