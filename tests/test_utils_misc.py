"""Coverage for utilities: prefetch, profiling, tracking, task cloning."""

import json
import sys

import numpy as np
import pytest

from algonauts2025_tpu.data.dataset import SegmentData, prefetch_to_device
from algonauts2025_tpu.experiment.tracking import WandbLoggerConfig


def _batches(n=3, b=2):
    for i in range(n):
        yield SegmentData(
            data={"x": np.full((b, 4), float(i), np.float32)},
            segments=[None] * b,
        )


def test_prefetch_to_device_order_and_content():
    out = list(prefetch_to_device(_batches(), size=2))
    assert len(out) == 3
    for i, batch in enumerate(out):
        np.testing.assert_allclose(np.asarray(batch.data["x"]), float(i))


def test_prefetch_propagates_errors():
    def bad():
        yield from _batches(1)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad()))


def test_local_run_logger(tmp_path):
    logger = WandbLoggerConfig(offline=True, project="p").build(
        save_dir=tmp_path, xp_config={"a": 1}, id="run1"
    )
    logger.log({"loss": 1.0, "pearson": 0.5}, step=3)
    logger.finish()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.0 and lines[0]["_step"] == 3
    assert json.loads((tmp_path / "run_config.json").read_text()) == {"a": 1}


class _FakeWandbRun:
    def __init__(self, kwargs):
        self.init_kwargs = kwargs
        self.logged: list = []
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    def finish(self):
        self.finished = True


class _FakeWandb:
    """Stand-in for the wandb package (absent in this image): records the
    init/log/finish surface the mirror path drives (reference
    modeling_utils/utils.py:163-210 runs the real one via Lightning)."""

    def __init__(self, fail_init=False):
        self.fail_init = fail_init
        self.runs: list = []

    def init(self, **kwargs):
        if self.fail_init:
            raise RuntimeError("api key missing")
        run = _FakeWandbRun(kwargs)
        self.runs.append(run)
        return run


def test_wandb_mirror_executes(tmp_path, monkeypatch):
    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = WandbLoggerConfig(project="p", group="g", name="n").build(
        save_dir=tmp_path, xp_config={"a": 1}, id="run1"
    )
    logger.log({"loss": 2.0}, step=7)
    logger.finish()
    (run,) = fake.runs
    assert run.init_kwargs["project"] == "p"
    assert run.init_kwargs["group"] == "g"
    assert run.init_kwargs["id"] == "run1"
    assert run.init_kwargs["config"] == {"a": 1}
    assert run.logged == [({"loss": 2.0}, 7)]
    assert run.finished
    # the JSONL stream is written regardless of the mirror
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 2.0 and lines[0]["_step"] == 7


def test_wandb_offline_skips_init(tmp_path, monkeypatch):
    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = WandbLoggerConfig(offline=True, project="p").build(save_dir=tmp_path)
    logger.log({"loss": 1.0}, step=0)
    logger.finish()
    assert fake.runs == []


def test_wandb_init_failure_warns_and_falls_back(tmp_path, monkeypatch, caplog):
    fake = _FakeWandb(fail_init=True)
    monkeypatch.setitem(sys.modules, "wandb", fake)
    with caplog.at_level("WARNING", logger="algonauts2025_tpu.experiment.tracking"):
        logger = WandbLoggerConfig(project="p").build(save_dir=tmp_path)
    assert any("wandb.init failed" in r.message for r in caplog.records)
    logger.log({"loss": 3.0}, step=1)  # JSONL path still works
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 3.0


def test_wandb_broken_import_warns_and_falls_back(tmp_path, monkeypatch, caplog):
    """An importable-but-broken wandb (the classic protobuf-mismatch
    TypeError at import time) must degrade to JSONL-only with a warning,
    not take the run down (r4 review: the guard only caught ImportError)."""
    import importlib.abc
    import importlib.machinery

    monkeypatch.delitem(sys.modules, "wandb", raising=False)

    class _BoomLoader(importlib.abc.Loader):
        def create_module(self, spec):
            return None

        def exec_module(self, module):
            raise TypeError("descriptors cannot be created directly")

    class _Finder(importlib.abc.MetaPathFinder):
        def find_spec(self, name, path, target=None):
            if name == "wandb":
                return importlib.machinery.ModuleSpec("wandb", _BoomLoader())
            return None

    finder = _Finder()
    sys.meta_path.insert(0, finder)
    try:
        with caplog.at_level("WARNING", logger="algonauts2025_tpu.experiment.tracking"):
            logger = WandbLoggerConfig(project="p").build(save_dir=tmp_path)
    finally:
        sys.meta_path.remove(finder)
        sys.modules.pop("wandb", None)
    assert any("wandb import failed" in r.message for r in caplog.records)
    logger.log({"loss": 4.0}, step=2)  # JSONL path still works
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 4.0


def test_task_clone_obj(tmp_path):
    import pydantic

    from algonauts2025_tpu.cache import TaskInfra

    class Toy(pydantic.BaseModel):
        x: int = 1
        nested: dict = {"y": 2}
        infra: TaskInfra = TaskInfra()

        def model_post_init(self, _ctx):
            self.infra.bind(self)

    t = Toy(infra=TaskInfra(folder=str(tmp_path)))
    t2 = t.infra.clone_obj(**{"x": 5, "infra.mode": "force"})
    assert t2.x == 5 and t2.infra.mode == "force"
    assert t.x == 1  # original untouched


def test_bench_median_pass_dedup_tripwire(monkeypatch):
    """bench.median_pass must not report a dedup-inflated median: with 2 of
    3 passes suspiciously fast (axon dedupes repeated identical
    executions, CLAUDE.md) the median IS the bogus fast value, so the
    slowest pass is reported instead (r3 review)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_module", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "PASSES", 3)

    fast_fast_slow = iter([0.1, 0.1, 1.0])
    assert bench.median_pass(lambda: next(fast_fast_slow)) == 1.0
    fast_slow_slow = iter([0.1, 1.0, 1.1])
    assert bench.median_pass(lambda: next(fast_slow_slow)) == 1.1
    steady = iter([1.0, 1.1, 1.2])
    assert bench.median_pass(lambda: next(steady)) == 1.1


def _fake_run(folder, score=None, corrupt_zip=False):
    """A minimal grid-run folder: submission.zip (+ optional metrics.csv)."""
    import io
    import zipfile

    import numpy as np
    import pandas as pd

    folder.mkdir(parents=True)
    preds = {"sub-01": {"s07e01a": np.full((4, 3), float(score or 0.0))}}
    if corrupt_zip:
        (folder / "submission.zip").write_bytes(b"not a zip")
    else:
        buf = io.BytesIO()
        np.save(buf, preds, allow_pickle=True)
        with zipfile.ZipFile(folder / "submission.zip", "w") as zf:
            zf.writestr("submission.npy", buf.getvalue())
    if score is not None:
        pd.DataFrame([{"val/pearson": score}]).to_csv(folder / "metrics.csv", index=False)
    else:
        (folder / "metrics.csv").write_text("garbage,,,\n\x00")


def test_score_weighted_ensemble_skips_scoreless_runs(tmp_path):
    """A partially-written run folder (corrupt metrics.csv) must be skipped
    with a warning under weigh_by_score, not crash the whole ensemble."""
    import numpy as np

    from algonauts2025_tpu.grids.average_submissions import average_submissions

    _fake_run(tmp_path / "a", score=0.5)
    _fake_run(tmp_path / "b", score=None)  # corrupt metrics.csv
    out = average_submissions(tmp_path, weigh_by_score=True)
    avg = np.load(tmp_path / "submission.npy", allow_pickle=True).item()
    # only run "a" (score 0.5) contributes -> values equal its predictions
    np.testing.assert_allclose(avg["sub-01"]["s07e01a"], 0.5)
    assert out.exists()


def test_ensemble_all_zips_unreadable_raises_clearly(tmp_path):
    import pytest

    from algonauts2025_tpu.grids.average_submissions import average_submissions

    _fake_run(tmp_path / "a", score=0.5, corrupt_zip=True)
    _fake_run(tmp_path / "b", score=0.1, corrupt_zip=True)
    with pytest.raises(RuntimeError, match="failed to load"):
        average_submissions(tmp_path)
