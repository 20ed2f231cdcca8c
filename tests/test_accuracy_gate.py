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