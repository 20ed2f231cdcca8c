"""Direct unit coverage for infra pieces otherwise only exercised through
the end-to-end suites: FrameStore, config builders, profiling timer."""

import time

import numpy as np
import pandas as pd
import pytest


def test_frame_store_roundtrip(tmp_path):
    from algonauts2025_tpu.cache.frame_store import FrameStore

    store = FrameStore(tmp_path / "frames")
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    key = "some/awkward key:with*chars" * 4  # long + unsafe characters
    assert key not in store
    with pytest.raises(KeyError):
        store[key]
    store[key] = df
    assert key in store
    pd.testing.assert_frame_equal(store[key], df)
    # distinct keys with the same sanitized stem stay distinct
    other = key + "!"
    store[other] = df.assign(a=[9, 9, 9])
    assert store[other].a.tolist() == [9, 9, 9]
    assert store[key].a.tolist() == [1, 2, 3]
    store.clear()
    assert key not in store and other not in store


def test_convert_to_pydantic_builds_and_forbids():
    import pydantic

    from algonauts2025_tpu.config.builders import convert_to_pydantic

    class Thing:
        def __init__(self, alpha: int, beta: float = 2.0):
            self.alpha = alpha
            self.beta = beta

    class Base(pydantic.BaseModel):
        model_config = pydantic.ConfigDict(extra="forbid")
        name: str

    Cfg = convert_to_pydantic(Thing, "Thing", parent_class=Base)
    built = Cfg(alpha=3).build()
    assert isinstance(built, Thing)
    assert (built.alpha, built.beta) == (3, 2.0)
    assert Cfg(alpha=1).name == "Thing"
    with pytest.raises(pydantic.ValidationError):
        Cfg(alpha=1, gamma=5)  # extra="forbid" inherited
    with pytest.raises(pydantic.ValidationError):
        Cfg()  # alpha is required


def test_validate_kwargs():
    from algonauts2025_tpu.config.builders import validate_kwargs

    def fn(a, b=1):
        return a + b

    validate_kwargs(fn, {"a": 1, "b": 2})
    with pytest.raises(ValueError, match="Invalid kwarg 'c'"):
        validate_kwargs(fn, {"c": 3})

    def fn_var(a, **kw):
        return a

    validate_kwargs(fn_var, {"anything": 1})  # **kwargs accepts all


def test_stage_timer():
    from algonauts2025_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with timer.stage("decode"):
        time.sleep(0.01)
    with timer.stage("decode"):
        time.sleep(0.01)
    with timer.stage("encode"):
        time.sleep(0.005)
    report = timer.summary()
    assert report["decode"]["total_s"] >= 0.02
    assert report["decode"]["count"] == 2
    assert report["encode"]["total_s"] >= 0.005
    assert set(report) == {"decode", "encode"}
