"""External fan-out: job array through a stub launcher + mid-run resume.

Covers the exca-array semantics the reference gets from Slurm
(modeling_utils utils.py:124-155): parallel submission, per-element status,
skip-if-done, and recovery of a killed element from last.ckpt.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from algonauts2025_tpu.data.synthetic import make_synthetic_study
from algonauts2025_tpu.experiment import Experiment


def _base_config(tmp_path, study_path, folder: str, n_epochs: int = 1) -> dict:
    from test_experiment_e2e import _config

    cfg = _config(tmp_path, study_path)
    cfg["n_epochs"] = n_epochs
    cfg["infra"] = {"folder": folder, "mode": "retry", "cluster": None}
    return cfg


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    root = tmp_path_factory.mktemp("fanout")
    path = make_synthetic_study(
        root / "data", with_video=False, n_parcels=16, duration=40.0
    )
    return root, path


_REPO_ROOT = str(Path(__file__).resolve().parents[1])


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single-device CPU workers
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_job_array_external_launcher(study, tmp_path):
    root, study_path = study
    # warm the feature/study caches in-process so parallel workers only read
    warm = _base_config(root, study_path, str(tmp_path / "warm"))
    Experiment(**warm).run()

    launcher = f"{sys.executable} -m algonauts2025_tpu.grids.run_config"
    grid_root = tmp_path / "grid"
    tasks = []
    template = None
    for seed in (1, 2, 3):
        cfg = _base_config(root, study_path, str(grid_root / f"seed{seed}"))
        cfg["seed"] = seed
        task = Experiment(**cfg)
        tasks.append(task)
        template = template or task

    # one element is pre-completed: the array must skip it
    tasks[0].run()
    assert tasks[0].infra.status() == "completed"

    array_infra = template.infra.model_copy(
        update={"folder": str(grid_root), "cluster": "external", "max_workers": 2}
    )
    array_infra.bind(template)
    old_env = os.environ.get("ALGONAUTS_TPU_LAUNCHER")
    old_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["ALGONAUTS_TPU_LAUNCHER"] = launcher
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        with array_infra.job_array() as arr:
            arr.extend(tasks)
    finally:
        if old_env is None:
            os.environ.pop("ALGONAUTS_TPU_LAUNCHER", None)
        else:
            os.environ["ALGONAUTS_TPU_LAUNCHER"] = old_env
        if old_platforms is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old_platforms

    summary = json.loads((grid_root / "job_array" / "array_status.json").read_text())
    by_index = {e["index"]: e for e in summary}
    assert by_index[0]["status"] == "skipped (completed)"
    for i in (1, 2):
        assert by_index[i]["returncode"] == 0
        assert by_index[i]["status"] == "completed"
        assert Path(by_index[i]["log"]).exists()
    for seed in (1, 2, 3):
        folder = grid_root / f"seed{seed}"
        assert (folder / "metrics.csv").exists()
        assert (folder / "submission.zip").exists()


_CRASH_HARNESS = """
import os, signal, sys
from algonauts2025_tpu.training import trainer as tr

_orig = tr.BrainTrainer.save_checkpoint

def _save_then_die(self, name, epoch=0, **kw):
    out = _orig(self, name, epoch=epoch, **kw)
    if name == "last" and epoch == 2:
        # simulate preemption right after the epoch-2 checkpoint committed
        os.kill(os.getpid(), signal.SIGKILL)
    return out

tr.BrainTrainer.save_checkpoint = _save_then_die
from algonauts2025_tpu.grids.run_config import main
main(sys.argv[1])
"""


def test_killed_element_resumes_from_last_ckpt(study, tmp_path):
    root, study_path = study
    folder = tmp_path / "victim"
    cfg = _base_config(root, study_path, str(folder), n_epochs=6)
    cfg_path = tmp_path / "victim.json"
    cfg_path.write_text(json.dumps(cfg, default=str))
    harness = tmp_path / "crash_harness.py"
    harness.write_text(_CRASH_HARNESS)

    proc = subprocess.run(
        [sys.executable, str(harness), str(cfg_path)],
        env=_worker_env(),
        capture_output=True,
        timeout=600,
    )
    assert proc.returncode == -signal.SIGKILL
    assert (folder / "last.ckpt").exists()
    jsonl = folder / "metrics.jsonl"

    def _epochs() -> list[int]:
        rows = []
        for line in jsonl.read_text().splitlines():
            try:
                rows.append(int(json.loads(line)["epoch"]))
            except Exception:
                continue
        return rows

    assert max(_epochs()) == 2  # died right after epoch 2's checkpoint

    # relaunch the same element (mode=retry in the config): must resume
    out = subprocess.run(
        [sys.executable, "-m", "algonauts2025_tpu.grids.run_config", str(cfg_path)],
        env=_worker_env(),
        capture_output=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    epochs = _epochs()
    # every epoch trained exactly once across both processes: the resumed
    # run continued from the checkpoint instead of starting over
    assert max(epochs) == 5
    assert sorted(set(epochs)) == sorted(epochs)
    assert epochs.count(0) == 1 and epochs.count(3) == 1

def test_slice_launcher_template_dryrun(study, tmp_path):
    """The in-tree TPU slice launcher (scripts/launch_tpu_slice.sh, the
    concrete ALGONAUTS_TPU_LAUNCHER for BASELINE configs #4-5) must drive a
    job-array element end to end in DRYRUN mode: print the exact gcloud
    queued-resources plan, then run the element locally."""
    root, study_path = study
    script = Path(_REPO_ROOT) / "scripts" / "launch_tpu_slice.sh"
    folder = tmp_path / "slice"
    cfg = _base_config(root, study_path, str(folder))
    cfg_path = tmp_path / "task_00000.json"
    cfg_path.write_text(json.dumps(cfg, default=str))

    env = _worker_env()
    env["TPU_SLICE_DRYRUN"] = "1"
    out = subprocess.run(
        ["bash", str(script), str(cfg_path)],
        env=env,
        capture_output=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr.decode()[-2000:]
    plan = out.stderr.decode()
    # the template's gcloud plan actually rendered (all five stages)
    assert "queued-resources create" in plan
    assert "--accelerator-type v5litepod-64" in plan
    assert "tpu-vm ssh" in plan and "--worker=all" in plan
    assert "queued-resources delete" in plan
    # and the element really ran
    assert (folder / "metrics.csv").exists()
