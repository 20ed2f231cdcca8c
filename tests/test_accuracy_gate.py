"""Accuracy-gate scaffolding (see ACCURACY.md).

Two layers of protection for the "mean voxel r within 0.5% of the
reference" gate, runnable without the real dataset or weights:

1. A fixed-seed synthetic end-to-end regression pinning ``val/pearson`` to
   a golden value.  The whole pipeline — study build, enhancers, feature
   caches, window batching, jit'd training, streaming metrics — feeds this
   number; any silent numeric change anywhere moves it.
2. bf16-vs-fp32 drift bounds on the frozen-backbone compute path at
   flagship head dims (the frozen backbones run in bf16 on the 16 GB chip;
   the measured drift documents the budget that leaves for the 0.5% gate).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algonauts2025_tpu.data.synthetic import make_synthetic_study
from algonauts2025_tpu.experiment import Experiment

# Golden values for the fixed-seed run below (CPU backend with the
# 8-virtual-device conftest mesh, seed 33).  Recorded 2026-08-16;
# bit-identical across processes and PYTHONHASHSEED values.  A failure
# here means a numeric change somewhere in the pipeline — re-derive the
# golden ONLY after explaining the change.
# 2026-08-17: re-goldened for the epoch-0 jitter fix — the reference
# JitterWindows re-cuts windows on EVERY train epoch start including the
# first (callbacks.py:25); the old loader skipped epoch 0, so all epoch-0
# windows were unjittered and the whole training trajectory differed.
# 2026-08-17 (r3): re-goldened for two trunk parity fixes found by the
# x_transformers oracle (tests/test_trunk_oracle.py): exact-erf gelu in the
# FF (flax default is the tanh approximation; torch nn.GELU() is exact) and
# per-dim residual-scale vectors (x_transformers Residual.residual_scale is
# ones(dim), ours was a scalar).  Moved val/pearson by 3.6e-5.
GOLDEN_VAL_PEARSON = -0.012804046273231506
GOLDEN_TRAIN_LOSS = 0.5194171667098999


def test_val_pearson_golden_regression(tmp_path):
    from test_experiment_e2e import _config

    study_path = make_synthetic_study(
        tmp_path / "data", with_video=False, n_parcels=32, duration=40.0
    )
    cfg = _config(tmp_path, study_path)
    out = Experiment(**cfg).run()
    assert out["val/pearson"] == pytest.approx(GOLDEN_VAL_PEARSON, abs=1e-5)
    assert out["train/loss"] == pytest.approx(GOLDEN_TRAIN_LOSS, rel=1e-4)


@pytest.mark.parametrize("backbone_kind", ["llama"])
def test_bf16_drift_at_flagship_head_dims(backbone_kind, rng):
    """The frozen text trunk runs bf16 on chip; this pins the measured
    bf16-vs-fp32 drift of pooled hidden states at the flagship head_dim
    (128) so the accuracy budget stays visible.  Tolerances are measured
    ceilings (see ACCURACY.md), not targets."""
    import dataclasses

    from algonauts2025_tpu.models.backbones.llama import LlamaBackbone, LlamaConfig

    base = LlamaConfig(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_layers=2,
        num_heads=4,  # head_dim 128, flagship ratio
        num_kv_heads=2,
        dtype=jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 512, size=(2, 64)), jnp.int32)
    params = LlamaBackbone(base).init(jax.random.PRNGKey(0), tokens)["params"]

    out32 = LlamaBackbone(base).apply({"params": params}, tokens)
    cfg16 = dataclasses.replace(base, dtype=jnp.bfloat16)
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    out16 = LlamaBackbone(cfg16).apply({"params": params16}, tokens)

    a = np.asarray(out32, np.float64).reshape(out32.shape[0], -1)
    b = np.asarray(out16, np.float64).reshape(out16.shape[0], -1)
    # per-layer-stack cosine between fp32 and bf16 activations
    cos = np.sum(a * b, axis=-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert cos.min() > 0.999, cos
    assert rel < 0.02, rel

# -- the turnkey real-data gate harness (r4 verdict missing #1) --------------
#
# The real comparison needs the dataset + weights (absent here); these
# tests prove the HARNESS works: run the one-command gate on the synthetic
# study against a "reference" manufactured from our own outputs — it must
# pass on the faithful reference and FAIL on a deliberately perturbed one.


def _export_fake_reference(exp, ref_root, perturb=0.0, max_items=None):
    """Save our own extracted features in the gate's interchange format,
    optionally perturbed — the stand-in for export_reference_features.py."""
    from algonauts2025_tpu.data.helpers import extract_events
    from algonauts2025_tpu.experiment.accuracy_gate import item_key, portable_uid

    events = exp.data.get_events()
    features = exp.data.build_features(events)
    rng = np.random.default_rng(7)
    for name in ("text", "audio", "video"):
        feature = features.get(name)
        if feature is None:
            continue
        evs = extract_events(events, types=feature._event_types_helper)
        if max_items is not None:
            evs = evs[:max_items]
        out_dir = ref_root / name
        out_dir.mkdir(parents=True, exist_ok=True)
        for e, arr in zip(evs, feature._get_data(evs)):
            arr = np.asarray(arr, np.float32)
            if perturb:
                arr = arr + perturb * rng.standard_normal(arr.shape).astype(
                    np.float32
                )
            np.save(out_dir / f"{item_key(portable_uid(e))}.npy", arr)


def test_real_data_gate_harness(tmp_path):
    """One command end to end on the synthetic study: faithful reference
    passes every stage; perturbed features and shifted metrics FAIL."""
    from test_experiment_e2e import _config

    from algonauts2025_tpu.experiment import Experiment
    from algonauts2025_tpu.experiment.accuracy_gate import run_gate

    study_path = make_synthetic_study(
        tmp_path / "data", with_video=False, n_parcels=16, duration=40.0
    )
    cfg = _config(tmp_path, study_path)
    cfg["n_epochs"] = 1
    cfg["infra"] = {"folder": str(tmp_path / "gate_runs"), "mode": "cached"}

    # manufacture the "reference": our own features + our own val/pearson
    exp = Experiment(**cfg)
    _export_fake_reference(exp, tmp_path / "ref_ok", max_items=20)
    truth = Experiment(
        **{**cfg, "infra": {"folder": str(tmp_path / "truth"), "mode": "force"}}
    ).run()
    ref_metrics = tmp_path / "ref_metrics.json"
    ref_metrics.write_text(
        json.dumps({"val/pearson": [truth["val/pearson"]]})
    )

    verdict = run_gate(
        cfg,
        ref_features=tmp_path / "ref_ok",
        ref_metrics=ref_metrics,
        seeds=[33],
        max_items=20,
        out=tmp_path / "report.json",
    )
    assert verdict["complete"] and verdict["passed"], verdict
    assert verdict["features"]["modalities"]["text"]["passed"]
    assert verdict["gate"]["rel_diff"] <= 1e-9  # same seed, same pipeline
    assert (tmp_path / "report.json").exists()

    # perturbed features: stage 1 must fail AND block the recipe stage
    _export_fake_reference(exp, tmp_path / "ref_bad", perturb=0.1, max_items=20)
    bad = run_gate(
        cfg,
        ref_features=tmp_path / "ref_bad",
        ref_metrics=ref_metrics,
        seeds=[33],
        max_items=20,
    )
    assert not bad["passed"], bad
    assert not bad["features"]["modalities"]["text"]["passed"]
    assert "skipped" in bad["gate"]

    # shifted reference metrics: the 0.5% gate must fail (features pass;
    # the gate_seed33 run is task-cached from the passing invocation)
    ref_metrics.write_text(
        json.dumps({"val/pearson": [truth["val/pearson"] * 1.02 + 0.02]})
    )
    shifted = run_gate(
        cfg,
        ref_features=tmp_path / "ref_ok",
        ref_metrics=ref_metrics,
        seeds=[33],
        max_items=20,
    )
    assert shifted["features"]["passed"]
    assert not shifted["gate"]["passed"], shifted["gate"]
    assert not shifted["passed"]


def test_gate_stage_seed_fallback():
    """Protocol step 4: when the seed spread exceeds the gate width the
    comparison falls back to the means (and says so)."""
    from algonauts2025_tpu.experiment.accuracy_gate import gate_stage

    # tight seeds: plain single-value comparison
    g = gate_stage([0.2000, 0.2001], [0.2002, 0.2001])
    assert not g["compared_on_means"] and g["passed"]

    # wide spread, means within gate: fallback engages and passes
    g = gate_stage([0.195, 0.205], [0.205, 0.1955])
    assert g["compared_on_means"] and g["passed"]

    # wide spread, means beyond gate: fails on the means
    g = gate_stage([0.195, 0.205], [0.215, 0.225])
    assert g["compared_on_means"] and not g["passed"]


def test_gate_feature_comparisons_units(tmp_path):
    """compare_feature_items: thresholds, missing items, shape guards."""
    from algonauts2025_tpu.experiment.accuracy_gate import (
        compare_feature_items,
        item_key,
    )

    rng = np.random.default_rng(0)
    ref_dir = tmp_path / "audio"
    ref_dir.mkdir()
    a = rng.standard_normal((3, 8, 16)).astype(np.float32)
    np.save(ref_dir / f"{item_key('u1')}.npy", a)

    # identical: passes
    r = compare_feature_items("audio", [("u1", a)], ref_dir)
    assert r["passed"] and r["compared"] == 1

    # one layer decorrelated: fails with the layer-pearson stat
    b = a.copy()
    b[1] = rng.standard_normal((8, 16))
    r = compare_feature_items("audio", [("u1", b)], ref_dir)
    assert not r["passed"] and r["worst_layer_pearson"] < 0.999

    # text threshold: max|delta| 2e-2 fails, 2e-3 passes
    t = rng.standard_normal((4, 8)).astype(np.float32)
    tdir = tmp_path / "text"
    tdir.mkdir()
    np.save(tdir / f"{item_key('w1')}.npy", t)
    assert compare_feature_items("text", [("w1", t + 2e-3)], tdir)["passed"]
    assert not compare_feature_items("text", [("w1", t + 2e-2)], tdir)["passed"]

    # nothing comparable is a FAIL, not a vacuous pass
    assert not compare_feature_items("audio", [("unknown", a)], ref_dir)["passed"]
    # shape mismatch is a FAIL even when values would correlate
    r = compare_feature_items("audio", [("u1", a[:, :, :8])], ref_dir)
    assert not r["passed"] and r["shape_mismatches"]


def test_gate_cli_usage():
    from algonauts2025_tpu.experiment.accuracy_gate import main

    with pytest.raises(SystemExit):
        main([])  # nothing to compare


def test_gate_subject_report(tmp_path):
    """Per-subject comparison (protocol step 3): seed-means of shared
    val/subj_pearson* columns, informational only."""
    import pandas as pd

    from algonauts2025_tpu.experiment.accuracy_gate import subject_report

    csv = tmp_path / "ref.csv"
    pd.DataFrame(
        [{"val/pearson": 0.2, "val/subj_pearson/sub-01": 0.21,
          "val/subj_pearson/sub-02": 0.19}]
    ).to_csv(csv, index=False)
    ours = {"val/pearson": [0.2], "val/subj_pearson/sub-01": [0.215, 0.205]}
    rep = subject_report(ours, csv)
    assert set(rep) == {"val/subj_pearson/sub-01"}  # only shared columns
    assert rep["val/subj_pearson/sub-01"]["rel_diff"] == pytest.approx(
        abs(0.21 - 0.21) / 0.21, abs=1e-12
    )
    assert subject_report(ours, tmp_path / "ref.json") is None  # csv only


def test_gate_degenerate_reference_inputs(tmp_path):
    """Degenerate reference metrics fail with clear errors, not
    IndexError/NaN verdicts (r5 review)."""
    import pandas as pd

    from algonauts2025_tpu.experiment.accuracy_gate import (
        _load_reference_metrics,
        gate_stage,
        subject_report,
    )

    empty = tmp_path / "empty.csv"
    pd.DataFrame({"val/pearson": [float("nan")]}).to_csv(empty, index=False)
    with pytest.raises(ValueError, match="no non-NaN"):
        _load_reference_metrics(empty)
    with pytest.raises(ValueError, match=">=1 val/pearson"):
        gate_stage([], [0.2])
    with pytest.raises(ValueError, match="gate undefined"):
        gate_stage([0.2], [0.0])
    # all-NaN subject column: rel_diff is None, not NaN (NaN is truthy)
    nan_csv = tmp_path / "nan.csv"
    pd.DataFrame(
        {"val/pearson": [0.2], "val/subj_pearson/sub-01": [float("nan")]}
    ).to_csv(nan_csv, index=False)
    rep = subject_report({"val/subj_pearson/sub-01": [0.2]}, nan_csv)
    assert rep["val/subj_pearson/sub-01"]["rel_diff"] is None


# Trimodal golden (r5): the text-only golden above cannot see the audio
# (wav decode -> polyphase -> mel -> conformer) or video (cv2 ring-buffer
# decode -> patchify -> ViT -> flash/XLA attention) numeric paths, nor
# contrastive InfoNCE or modality dropout.  This pins the full trimodal
# fixed-seed pipeline on the CPU-8 conftest backend; measured
# bit-identical across processes (2026-08-19).  (The same run on the
# real TPU reads 0.015471 — backend numerics differ; the golden is a
# CPU regression pin, not a cross-backend parity claim.)  Re-derive
# ONLY after explaining the change.
GOLDEN_TRIMODAL_VAL_PEARSON = 0.016289331018924713
GOLDEN_TRIMODAL_TRAIN_LOSS = 1.053185224533081


def test_trimodal_golden_regression(tmp_path):
    from test_experiment_e2e import _config

    study_path = make_synthetic_study(
        tmp_path / "data", with_video=True, n_parcels=16, duration=24.0,
        subjects=("sub-01",), train_episodes=("e01a", "e01b"),
        test_episodes=("e01a",),
    )
    cache = str(tmp_path / "cache")
    cfg = _config(tmp_path, study_path)
    cfg["data"]["study"]["enhancers"].append({"name": "ExtractAudioFromVideo"})
    cfg["data"]["audio_feature"] = {"name": "Wav2VecBert", "model_name": "tiny-random",
                                    "infra": {"folder": cache}}
    cfg["data"]["video_feature"] = {"name": "VJEPA2", "model_name": "tiny-random",
                                    "window_batch": 2, "infra": {"folder": cache}}
    cfg["brain_model_config"]["contrastive_enabled"] = True
    cfg["brain_model_config"]["contrastive_modalities"] = ["video"]
    cfg["brain_model_config"]["modality_dropout"] = 0.3
    cfg["n_epochs"] = 1
    out = Experiment(**cfg).run()
    assert out["val/pearson"] == pytest.approx(GOLDEN_TRIMODAL_VAL_PEARSON, abs=1e-5)
    assert out["train/loss"] == pytest.approx(GOLDEN_TRIMODAL_TRAIN_LOSS, rel=1e-4)
