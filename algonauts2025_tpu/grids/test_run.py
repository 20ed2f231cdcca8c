"""Smoke run: the full pipeline on a small slice (reference grids/test_run.py).

With real Algonauts data present (ALGONAUTS_TPU_DATA), runs 10 timelines
for 6 epochs like the reference smoke config.  Without it, generates a
synthetic study (data.synthetic) and uses tiny random backbones so the
complete path — study build, enhancers, feature caches, training, metrics,
submission — executes anywhere in minutes.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from ..config import ConfDict
from .defaults import default_config


def build_test_config(tmp_root: str | None = None) -> dict:
    cfg = ConfDict(default_config)
    update = {
        "save_checkpoints": False,
        "n_epochs": 6,
        "infra.cluster": None,
        "infra.mode": "force",
        "data.num_workers": 0,
        "data.study.query": "subject_timeline_index<10",
        "wandb_config": None,
    }
    cfg.update(update)

    data_root = Path(cfg["data.study.path"])
    if not (data_root / "download").exists():
        # no real dataset: synthesize one and shrink the backbones
        from ..data.synthetic import make_synthetic_study

        root = Path(tmp_root or os.path.join(cfg["infra.folder"], "synthetic_data"))
        study_path = make_synthetic_study(root, with_video=True)
        cfg.update(
            {
                "data.study.path": str(study_path),
                "data.text_feature.model_name": "tiny-random",
                "data.audio_feature.model_name": "tiny-random",
                "data.video_feature.model_name": "tiny-random",
                "brain_model_config.hidden": 96,
                "brain_model_config.depth": 2,
                "brain_model_config.heads": 4,
                "n_epochs": 4,
            }
        )
    folder = os.path.join(cfg["infra"]["folder"], "test")
    cfg["infra.folder"] = folder
    for feat in ["text_feature", "audio_feature", "video_feature", "neuro"]:
        cfg[f"data.{feat}.infra.folder"] = os.path.join(folder, "feature_cache")
    cfg["data.study.infra.folder"] = os.path.join(folder, "study_cache")
    return cfg.to_dict()


def test_run(config: dict) -> dict:
    from ..experiment import Experiment

    task = Experiment(**config)
    task.infra.clear_job()
    return task.run()


if __name__ == "__main__":
    config = build_test_config()
    folder = config["infra"]["folder"]
    if os.path.exists(folder):
        shutil.rmtree(folder)
    out = test_run(config)
    print(out)
