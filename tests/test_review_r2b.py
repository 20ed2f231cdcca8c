"""Regression tests for the round-2b review findings (training/features)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pearson_loss_reductions(rng):
    from algonauts2025_tpu.training.losses import build_loss, pearson_loss

    pred = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    per = pearson_loss(pred, target, reduction="none")
    assert per.shape == (5,)
    np.testing.assert_allclose(
        float(pearson_loss(pred, target, reduction="sum")),
        float(jnp.sum(per)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(build_loss({"name": "PearsonLoss", "reduction": "sum"})(pred, target)),
        float(jnp.sum(per)),
        rtol=1e-6,
    )
    with pytest.raises(ValueError):
        build_loss({"name": "PearsonLoss", "reduction": "bogus"})


def test_sgd_weight_decay_applied(rng):
    """torch-style L2: decay must reach the update, not be silently dropped."""
    from algonauts2025_tpu.training.optim import OptimizerConfig

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.zeros((4,))}
    tx = OptimizerConfig(name="SGD", lr=0.1, kwargs={"weight_decay": 0.5}).build(0.1)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # zero gradient + L2 decay -> update = -lr * wd * w = -0.05
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-5)


def test_epoch_interval_schedule_steps_per_epoch():
    """interval='epoch' advances the schedule once per epoch (torch
    scheduler.step() semantics), not once per optimizer step."""
    from algonauts2025_tpu.training.optim import OptimConfig

    cfg = OptimConfig(
        optimizer={"name": "Adam", "lr": 1.0},
        scheduler={"name": "StepLR", "kwargs": {"step_size": 1, "gamma": 0.5}},
        interval="epoch",
    )
    _, schedule = cfg.build(total_steps=20, steps_per_epoch=5)
    lr = [float(schedule(s)) for s in (0, 4, 5, 9, 10)]
    assert lr[0] == lr[1]  # constant within epoch 0
    assert lr[2] == pytest.approx(lr[0] * 0.5)  # halved at epoch 1
    assert lr[3] == lr[2]
    assert lr[4] == pytest.approx(lr[0] * 0.25)

    with pytest.raises(ValueError):
        cfg.build(total_steps=20)  # steps_per_epoch required


def test_named_backbone_load_failure_is_loud(monkeypatch):
    """A real model name must never silently fall back to random weights
    (the cache is keyed by the config uid — a fallback would poison it)."""
    from algonauts2025_tpu.features.audio import Wav2VecBert
    from algonauts2025_tpu.features.text import LLAMA3p2
    from algonauts2025_tpu.features.video import VJEPA2

    # fail fast: without offline mode transformers retries the HF hub with
    # long network timeouts (~60 s per feature on this zero-egress box)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    for feat in (
        Wav2VecBert(model_name="definitely/not-a-model"),
        LLAMA3p2(model_name="definitely/not-a-model"),
        VJEPA2(model_name="definitely/not-a-model"),
    ):
        with pytest.raises(RuntimeError, match="refusing to substitute"):
            _ = feat.backbone


def test_text_encode_beyond_bucket_table(rng):
    """max_len beyond BUCKETS[-1] must extend the width, not crash."""
    from algonauts2025_tpu.features.text import HashTokenizer, TinyTextBackbone

    bb = TinyTextBackbone()
    long_text = " ".join(f"word{i}" for i in range(1500))
    ids, mask = bb.encode([long_text], max_len=2048)
    assert ids.shape[1] >= min(1500, 2048)
    assert mask.sum() > 1024  # nothing silently truncated to the old cap


def test_monitor_key_missing_raises(tmp_path, rng):
    """A misconfigured monitor must fail loudly, not silently early-stop."""
    from algonauts2025_tpu.data.dataset import SegmentData
    from algonauts2025_tpu.models import FmriEncoderConfig
    from algonauts2025_tpu.training import (
        BrainTrainer,
        OptimConfig,
        TrainerConfig,
        build_loss,
        build_metric,
    )

    cfg = FmriEncoderConfig(n_subjects=2, depth=1, hidden=16, heads=2)
    dims = {"text": (1, 8)}
    model = cfg.build(dims, n_outputs=4, n_output_timesteps=3)
    data = {
        "text": rng.standard_normal((2, 1, 8, 6)).astype(np.float32),
        "subject_id": np.zeros((2, 1), np.int64),
        "fmri": rng.standard_normal((2, 4, 3)).astype(np.float32),
    }
    batch = SegmentData(data=data, segments=[None, None])
    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(optimizer={"name": "Adam", "lr": 1e-3}),
        metrics={
            "val/pearson": build_metric(
                {"name": "MultidimPearsonCorrCoef", "log_name": "pearson"}
            )
        },
        config=TrainerConfig(
            n_epochs=1, folder=None, save_checkpoints=False,
            monitor="val/definitely_missing",
        ),
    )
    trainer.init_state(batch, total_steps=2)
    with pytest.raises(KeyError, match="definitely_missing"):
        trainer.fit(lambda epoch: [batch], lambda: [batch])


def test_nested_uid_exclusions_apply():
    """A nested config's _exclude_from_cache_uid must not leak into the
    parent's uid (reference exca contract: device/batch_size/infra never
    invalidate caches, at any nesting level)."""
    from algonauts2025_tpu.config.uid import config_uid
    from algonauts2025_tpu.features.video import VJEPA2
    import pydantic

    class Parent(pydantic.BaseModel):
        model_config = pydantic.ConfigDict(extra="forbid")
        feature: VJEPA2 = VJEPA2(model_name="tiny-random")
        seed: int = 0

    a = Parent()
    b = Parent(feature=VJEPA2(model_name="tiny-random", window_batch=8))
    c = Parent(feature=VJEPA2(model_name="tiny-random", quantize=False))
    assert config_uid(a) == config_uid(b)  # excluded nested field
    assert config_uid(a) != config_uid(c)  # value-relevant nested field
    assert config_uid(a) != config_uid(Parent(seed=1))


def test_streaming_pearson_near_constant_no_nan(rng):
    """fp32 cancellation on near-constant columns must not produce NaN."""
    from algonauts2025_tpu.ops import (
        compute_pearson,
        init_pearson_state,
        update_pearson_state,
    )

    state = init_pearson_state(3)
    base = np.array([1e3, -1e3, 5e2], np.float32)
    for _ in range(50):
        x = base[None] + 1e-5 * rng.standard_normal((16, 3)).astype(np.float32)
        y = base[None] + 1e-5 * rng.standard_normal((16, 3)).astype(np.float32)
        state = update_pearson_state(state, jnp.asarray(x), jnp.asarray(y))
    r = np.asarray(compute_pearson(state))
    assert np.isfinite(r).all(), r


def test_confdict_uid_nonfinite_floats():
    from algonauts2025_tpu.config.confdict import ConfDict

    uid = ConfDict({"optim.grad_clip": float("inf"), "x": float("nan")}).to_uid()
    assert "inf" in uid and "nan" in uid


def test_wav_odd_fmt_chunk(tmp_path):
    """RIFF word alignment: an odd-sized fmt chunk is followed by a pad
    byte that must be skipped."""
    import struct

    from algonauts2025_tpu.io import wav as wavio

    sr, frames = 16000, 100
    data = (np.sin(np.arange(frames)) * 1000).astype(np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16) + b"\x07"  # 17 bytes
    riff = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"\x00"  # pad byte
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WAVE" + riff
    p = tmp_path / "odd.wav"
    p.write_bytes(blob)
    info = wavio.info(str(p))
    assert info.samplerate == sr and info.frames == frames
    out = wavio.read(str(p))
    assert out.shape[0] == frames


def test_flash_attention_explicit_blocks_honored(rng):
    """Explicit non-default blocks must reach the kernel (VMEM control)."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((1, 2, 2048, 64)).astype(np.float32))
    out = flash_attention(q, q, q, q_block=256, kv_block=512, interpret=True)
    ref = flash_attention(q, q, q, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_enhancer_round_trip_keeps_kwargs():
    """StudyLoader.enhancers must serialize subclass fields: a lossy dump
    made job-array workers run with DEFAULT enhancer settings and gave
    differing enhancer configs identical task uids."""
    import json

    from algonauts2025_tpu.config.uid import config_uid
    from algonauts2025_tpu.data.study import StudyLoader

    sl = StudyLoader(
        study="synthetic",
        path="/tmp/x",
        enhancers=[
            {"name": "AddSentenceToWords", "max_unmatched_ratio": 0.3},
            {"name": "AddContextToWords", "max_context_len": 64, "sentence_only": False},
        ],
    )
    rt = StudyLoader(**json.loads(sl.model_dump_json()))
    assert rt.enhancers[0].max_unmatched_ratio == 0.3
    assert rt.enhancers[1].max_context_len == 64
    assert config_uid(sl) == config_uid(rt)
    other = StudyLoader(
        study="synthetic", path="/tmp/x",
        enhancers=[{"name": "AddSentenceToWords", "max_unmatched_ratio": 0.1}],
    )
    assert config_uid(sl) != config_uid(other)


def test_prefetch_sentinel_survives_full_queue(rng):
    """A slow consumer must still see end-of-epoch (the END sentinel was
    dropped when the queue was full, hanging the final get forever)."""
    import time

    from algonauts2025_tpu.data.dataset import SegmentData, prefetch_to_device

    batches = [
        SegmentData(data={"x": np.ones((2, 2), np.float32) * i}, segments=[None, None])
        for i in range(5)
    ]
    seen = []
    for b in prefetch_to_device(iter(batches)):
        time.sleep(0.05)  # slower than the producer
        seen.append(float(np.asarray(b.data["x"])[0, 0]))
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_mlp_prelu_and_unsupported_norms(rng):
    from algonauts2025_tpu.models.common import MlpConfig
    import jax

    mlp = MlpConfig(hidden_sizes=[8], activation_layer="prelu").build(
        output_size=4
    )
    x = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (3, 4) and np.isfinite(np.asarray(out)).all()

    import pytest as _pytest

    bad = MlpConfig(hidden_sizes=[8], norm_layer="batch").build(output_size=4)
    with _pytest.raises(NotImplementedError):
        bad.init(jax.random.PRNGKey(0), x)


# -- round-3 code-review regressions ---------------------------------------


def test_loss_rejects_unsupported_kwargs():
    """A silently-dropped loss kwarg trains a different objective
    (round-3 review; same class as the r2 optimizer kwarg fix)."""
    import pytest

    from algonauts2025_tpu.training import build_loss

    with pytest.raises(ValueError, match="unsupported kwargs.*swap"):
        build_loss({"name": "TripletMarginLoss", "kwargs": {"swap": True}})
    with pytest.raises(ValueError, match="unsupported kwargs"):
        build_loss({"name": "HingeEmbeddingLoss", "kwargs": {"reduction": "sum"}})
    # supported kwargs still build
    build_loss({"name": "HingeEmbeddingLoss", "kwargs": {"margin": 0.3}})


def test_incremental_tokenizer_whitespace_guard():
    """Contexts with whitespace runs / non-space whitespace must bypass the
    per-word concatenation (it can genuinely diverge there) — structural
    guard, not just the 32-sample check (round-3 review)."""
    from algonauts2025_tpu.features.text import TinyTextBackbone

    bb = TinyTextBackbone()
    for t in ["a  double", "tab\there", "line\nbreak", "nb space and more"]:
        assert bb._tokenize(t) == bb._tokenize_full(t), t
    # the fast-path per-word cache must not have been touched:
    # equality alone could pass by luck without the guard
    assert not bb._word_ids, "whitespace contexts hit the fast path"
    simple = "plain single spaced words"
    assert bb._tokenize(simple) == bb._tokenize_full(simple)
    assert bb._word_ids  # fast path engaged for the simple context


def test_init_distributed_requires_process_id(monkeypatch):
    """JAX_NUM_PROCESSES without JAX_PROCESS_ID must fail loudly instead of
    giving every worker rank 0 (round-3 review)."""
    import pytest

    from algonauts2025_tpu.parallel import mesh

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        mesh.init_distributed()
