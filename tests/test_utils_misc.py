"""Coverage for utilities: prefetch, profiling, tracking, task cloning."""

import json

import numpy as np
import pytest

from algonauts2025_tpu.data.dataset import SegmentData, prefetch_to_device
from algonauts2025_tpu.experiment.tracking import WandbLoggerConfig
from algonauts2025_tpu.utils import StageTimer


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


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    for _ in timer.wrap("b", range(3)):
        pass
    summary = timer.summary()
    assert summary["a"]["count"] == 1
    assert summary["b"]["count"] == 3


def test_local_run_logger(tmp_path):
    logger = WandbLoggerConfig(offline=True, project="p").build(
        save_dir=tmp_path, xp_config={"a": 1}, id="run1"
    )
    logger.log({"loss": 1.0, "pearson": 0.5}, step=3)
    logger.finish()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.0 and lines[0]["_step"] == 3
    assert json.loads((tmp_path / "run_config.json").read_text()) == {"a": 1}


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
