"""Benchmark: trimodal feature-extraction throughput on one TPU chip.

Measures stimulus-seconds processed per wall-clock second for the full
trimodal frontend — the north-star metric (BASELINE.json): synthetic
30 s stimulus, FULL-SIZE backbones (Llama-3.2-3B, w2v-bert-2.0 conformer,
V-JEPA2 ViT-G) with random weights (the public checkpoints are not
downloadable in this environment; throughput is weight-independent), real
host decode paths (wav parse, cv2 video decode with the single-pass
sliding-window ring buffer) and the fused on-device frontends
(polyphase resample + kaldi mel, patchify/normalize).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no A100 number; the denominator is
a per-stage derivation of the reference pipeline AS WRITTEN on one A100
(BASELINE.md "A100 denominator derivation"): everything runs fp32 (the
fp16 branch in text.py:168 is unreachable; video/audio set no dtype), so
ViT-G costs 31.7 TFLOP/window on the 19.5 TF/s non-tensor-core path with
fp32 SDPA attention, plus serial moviepy re-decode (~8x redundancy) and
per-window HF CPU preprocessing -> 5.8-7.8 s of A100 wall per stimulus
second = 0.13-0.17 st-s/s.  A100_BASELINE_EST = 0.16 (favorable end).
vs_tf32_scenario is also reported against 0.44 — the same pipeline if a
user added the TF32 enable line the reference does not contain.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

A100_BASELINE_EST = 0.16  # st-s/s/chip, reference code as written (BASELINE.md r4)
A100_TF32_SCENARIO = 0.44  # same pipeline + TF32 enabled (not in the reference code)
# pinned reference D2H rate for the weather-normalized secondary value:
# the dev tunnel's D2H swings 12-35 MB/s day to day (CLAUDE.md), moving the
# text stage's contract-fixed 11.4 MB layer-stack fetch by +/-0.6 s.
# value_weather_normalized re-prices that one fetch at this pinned rate so
# round-over-round headline deltas stop being weather deltas (r4 verdict
# weak #2).  25 MB/s = the mid-range of observed weather.
D2H_PINNED_MBPS = 25.0
TEXT_D2H_MB = 11.4  # the text stage's contract-fixed layer-stack D2H

# >= 1 s: below that the 2 Hz grid is empty and video warmup has no window
STIM_SECONDS = max(1.0, float(os.environ.get("BENCH_STIM_SECONDS", 30.0)))
# median of >=3 measured passes per stage: a single cold pass on a 1-core
# host under-reported by up to 25% in round 2 (driver 1.259 vs notes 1.33)
PASSES = max(1, int(os.environ.get("BENCH_PASSES", 3)))


def median_pass(run) -> float:
    """Median wall time of PASSES runs of ``run()`` (already warmed).

    Tripwire: the axon runtime can dedupe repeated identical executions
    (CLAUDE.md); suspiciously-fast passes are the symptom.  The spread
    check compares fastest to SLOWEST (not to the median: with 2 of 3
    passes deduped the median itself is the bogus fast value), and on a
    trip the slowest pass is reported — the one time that cannot have
    been inflated by dedup — so the headline can only be under-, never
    over-reported."""
    times = sorted(run() for _ in range(PASSES))
    if times[0] < 0.5 * times[-1]:
        log(
            f"WARNING: pass times {['%.2f' % t for t in times]} spread >2x — "
            "possible remote execution dedup; reporting the slowest pass"
        )
        return times[-1]
    return times[len(times) // 2]
WORDS_PER_SEC = 2.0
CONTEXT_WORDS = 256  # typical running-context length mid-episode


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def log_tunnel_weather() -> float | None:
    """Measure and log today's D2H rate for an 11.4 MB bf16 fetch (the
    text stage's contract-fixed layer-stack transfer).  The dev tunnel
    swings 12-33 MB/s day to day, moving the D2H-floor-bound text stage
    by +/-0.3 s — this makes a given bench record interpretable and
    feeds value_weather_normalized.  A FRESH array per fetch: jax.Array
    caches its host copy.  Returns the measured MB/s (None on failure)."""
    import jax
    import jax.numpy as jnp

    try:
        nbytes = 11_400_000
        fn = jax.jit(lambda k: jax.random.normal(k, (nbytes // 2,), jnp.bfloat16))
        rates = []
        for i in range(2):
            x = fn(jax.random.PRNGKey(i))
            jax.block_until_ready(x)
            t0 = time.time()
            np.asarray(x)
            rates.append(nbytes / (time.time() - t0) / 1e6)
        rate = max(rates)
        log(f"tunnel D2H: {rate:.0f} MB/s (11.4 MB floor = "
            f"{11.4 / rate:.2f}s of the text stage)")
        return rate
    except Exception as e:  # diagnostics must never fail the bench
        log(f"tunnel D2H probe failed: {e!r}")
        return None


def build_text_backbone():
    """Full-size Llama-3.2-3B with random weights (throughput-identical)."""
    import jax
    import jax.numpy as jnp

    from algonauts2025_tpu.features.text import HashTokenizer, JaxTextBackbone
    from algonauts2025_tpu.models.backbones.llama import LLAMA_3P2_3B, LlamaBackbone

    model = LlamaBackbone(LLAMA_3P2_3B)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return JaxTextBackbone(model, params, HashTokenizer(LLAMA_3P2_3B.vocab_size), 0)


def bench_text(words: list[str], contexts: list[str], backbone) -> float:
    """Seconds to encode all word contexts with Llama-3.2-3B.

    Drives the PRODUCTION feature path (features/text.py LLAMA3p2._compute):
    nested-prefix running contexts route through the single-forward chain
    path; broken chains fall back to the batched path — exactly what a
    real study run executes."""
    from algonauts2025_tpu.core.events import Word
    from algonauts2025_tpu.features.text import LLAMA3p2

    feat = LLAMA3p2()
    feat.set_backbone(backbone)
    events = [
        Word(start=0.5 * i, duration=0.4, text=w, context=c, timeline="bench")
        for i, (w, c) in enumerate(zip(words, contexts))
    ]

    def one_pass() -> float:
        t0 = time.time()
        out = list(feat._compute(events))
        assert len(out) == len(events)
        return time.time() - t0

    one_pass()  # warmup: compile chain/batch buckets, warm the token cache
    return median_pass(one_pass)


def build_audio_backbone():
    """Full-size w2v-bert-2.0 conformer with random weights."""
    import jax
    import jax.numpy as jnp

    from algonauts2025_tpu.features.audio import JaxAudioBackbone
    from algonauts2025_tpu.models.backbones.wav2vec_bert import (
        W2V_BERT_2_0,
        Wav2VecBertBackbone,
    )

    model = Wav2VecBertBackbone(W2V_BERT_2_0)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 16, 160)))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return JaxAudioBackbone(model, params)


def bench_audio(wav_path: Path, backbone) -> float:
    """Seconds to extract w2v-bert features for the full wav."""
    import jax.numpy as jnp

    from algonauts2025_tpu.io import wav as wavio
    from algonauts2025_tpu.ops.resample import resample_poly

    info = wavio.info(str(wav_path))

    def run() -> None:
        # the production path: fused native decode -> mono -> z-score
        wav = wavio.read_mono_zscore(str(wav_path))
        wav16 = resample_poly(jnp.asarray(wav), info.samplerate, 16000)
        backbone.hidden_states_2hz(wav16, int(2 * info.duration))  # stays on device

    run()  # warmup/compile

    def one_pass() -> float:
        t0 = time.time()
        run()
        return time.time() - t0

    return median_pass(one_pass)


def build_video_backbone(quantize: bool):
    """Full-size V-JEPA2 ViT-G with random weights.

    ``quantize=True`` builds the fused w8a8 static-scale path — since r4
    the production VJEPA2 default (features/video.py quantize=True,
    validated at r=0.99987 feature agreement vs exact bf16 at full ViT-G
    scale, ACCURACY.md); ``False`` builds the exact-bf16 path."""
    import jax
    import jax.numpy as jnp

    from algonauts2025_tpu.features.video import JaxVideoBackbone
    from algonauts2025_tpu.models.backbones.vjepa2 import VJEPA2_VITG, VJEPA2Backbone

    import dataclasses

    cfg = dataclasses.replace(VJEPA2_VITG, quantize=quantize, quant_static=quantize)
    model = VJEPA2Backbone(cfg, token_pool=True)
    crop = cfg.crop_size
    params = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, cfg.frames_per_clip, crop, crop, 3))
        )["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if quantize:
        from algonauts2025_tpu.features.video import _calibrated_static_model

        dyn_model = VJEPA2Backbone(
            dataclasses.replace(cfg, quant_static=False), token_pool=True
        )
        model, params = _calibrated_static_model(
            dataclasses.replace(cfg, quant_static=False),
            dyn_model,
            params,
            cfg.frames_per_clip,
            crop,
        )
    return JaxVideoBackbone(model, params, n_frames=64, crop_size=crop)


def bench_video(video_path: Path, backbone) -> float:
    """Seconds to extract V-JEPA2 ViT-G features at 2 Hz x 64 frames."""
    from algonauts2025_tpu.io.video import VideoClip

    wb = int(os.environ.get("BENCH_WB", 4))  # windows per device batch
    clip = VideoClip(str(video_path))
    times = np.linspace(0, clip.duration, int(2 * clip.duration) + 1)[1:]
    # warmup/compile on one batch
    first = next(clip.sliding_windows(times[:1], 64, 4.0))
    backbone.encode_windows(np.broadcast_to(first[None], (wb,) + first.shape).copy())
    clip.close()

    def one_pass() -> float:
        clip = VideoClip(str(video_path))
        t0 = time.time()
        batch: list = []
        pending: list = []  # two batches in flight (compute + H2D/D2H overlap)

        def submit(stack):
            pending.append(backbone.encode_windows_async(stack))
            while len(pending) > 2:
                np.asarray(pending.pop(0))

        for window in clip.sliding_windows(times, 64, 4.0):
            batch.append(window)
            if len(batch) == wb:
                submit(np.stack(batch))
                batch = []
        if batch:
            while len(batch) < wb:
                batch.append(batch[-1])
            submit(np.stack(batch))
        while pending:
            np.asarray(pending.pop(0))
        dt = time.time() - t0
        clip.close()
        return dt

    return median_pass(one_pass)


def bench_overlapped(
    words: list[str],
    contexts: list[str],
    wav_path: Path,
    video_path: Path,
    text_backbone,
    audio_backbone,
    video_backbone,
) -> float:
    """Wall seconds for the full trimodal prepare via the PRODUCTION
    driver: ``prepare_features(..., overlap=True)`` — the shipping default
    (data/helpers.py).  The three features' host decode/tokenization and
    D2H result fetches ride under each other's device compute (measured
    concurrent on this tunnel, scripts/probe_overlap.py), so the wall
    clock approaches the pure device-compute total instead of the sum of
    per-stage walls.  Fresh feature objects with RAM-only stores each
    pass -> every pass recomputes everything."""
    from algonauts2025_tpu.core.events import Sound, Video, Word
    from algonauts2025_tpu.data.helpers import prepare_features
    from algonauts2025_tpu.features.audio import Wav2VecBert
    from algonauts2025_tpu.features.text import LLAMA3p2
    from algonauts2025_tpu.features.video import VJEPA2

    wb = int(os.environ.get("BENCH_WB", 4))
    events = [
        Word(start=0.5 * i, duration=0.4, text=w, context=c, timeline="bench")
        for i, (w, c) in enumerate(zip(words, contexts))
    ]
    events.append(Sound(start=0.0, timeline="bench", filepath=str(wav_path)))
    events.append(Video(start=0.0, timeline="bench", filepath=str(video_path)))

    def one_pass() -> float:
        ft = LLAMA3p2()
        ft.set_backbone(text_backbone)
        fa = Wav2VecBert()
        fa.set_backbone(audio_backbone)
        fv = VJEPA2(window_batch=wb)
        fv.set_backbone(video_backbone)
        feats = {"video": fv, "text": ft, "audio": fa}
        t0 = time.time()
        prepare_features(feats, events, overlap=True)
        return time.time() - t0

    one_pass()  # warmup (stage benches already compiled; warms event/token caches)
    return median_pass(one_pass)


def bench_train() -> float:
    """Seconds per optimizer step of the flagship trunk (batch 16 trimodal,
    0.9B params, remat + contrastive + bf16 Adam mu — the defaults.py
    training recipe shapes)."""
    import jax

    from algonauts2025_tpu.data.dataset import SegmentData
    from algonauts2025_tpu.models import FmriEncoderConfig
    from algonauts2025_tpu.parallel import get_mesh, shard_batch
    from algonauts2025_tpu.training import (
        BrainTrainer,
        OptimConfig,
        TrainerConfig,
        build_loss,
    )

    cfg = FmriEncoderConfig(
        n_subjects=4,
        modality_dropout=0.3,
        remat=True,
        contrastive_enabled=True,
        contrastive_modalities=["video"],
    )
    feature_dims = {"text": (2, 3072), "audio": (2, 1024), "video": (2, 1408)}
    model = cfg.build(feature_dims, n_outputs=1000, n_output_timesteps=100)
    b, t = 16, 298
    rng = np.random.default_rng(0)
    data = {
        m: rng.standard_normal((b, l, d, t)).astype(np.float32)
        for m, (l, d) in feature_dims.items()
    }
    data["subject_id"] = rng.integers(0, 4, size=(b, 1))
    data["fmri"] = rng.standard_normal((b, 1000, 100)).astype(np.float32)
    batch = SegmentData(data=data, segments=[None] * b)  # type: ignore[list-item]

    trainer = BrainTrainer(
        model=model,
        loss_fn=build_loss({"name": "MSELoss"}),
        optim_config=OptimConfig(
            optimizer={
                "name": "Adam",
                "lr": 1e-4,
                "kwargs": {"weight_decay": 0.0, "mu_dtype": "bfloat16"},
            },
            scheduler={"name": "OneCycleLR", "kwargs": {"max_lr": 1e-4, "pct_start": 0.1}},
        ),
        metrics={},
        config=TrainerConfig(
            n_epochs=1, folder=None, save_checkpoints=False, seed=0,
            contrastive_weight=0.1,
        ),
        mesh=get_mesh(),
    )
    trainer.init_state(batch, total_steps=100)
    trainer._build_steps()
    device_batch = shard_batch(batch.data, trainer.mesh)
    key = jax.random.PRNGKey(0)
    state, loss, _ = trainer._train_step(trainer.state, device_batch, key)  # compile
    np.asarray(loss)
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", 8))
    t0 = time.time()
    for _ in range(n_steps):
        state, loss, _ = trainer._train_step(state, device_batch, key)
    np.asarray(loss)  # full sync (block_until_ready is unreliable on axon)
    dt = (time.time() - t0) / n_steps
    del trainer, state
    gc.collect()
    return dt


def main() -> None:
    import algonauts2025_tpu  # noqa: F401  (compile cache)
    import jax

    log(f"bench devices: {jax.devices()}")
    d2h_mbps = log_tunnel_weather()
    tmp = Path(tempfile.mkdtemp(prefix="algonauts_bench_"))

    # synthetic stimuli
    from algonauts2025_tpu.data.synthetic import _write_video, _write_wav

    rng = np.random.default_rng(0)
    wav_path = tmp / "stim.wav"
    _write_wav(wav_path, STIM_SECONDS, rng, sr=44100)
    video_path = tmp / "stim.mkv"
    have_video = _write_video(video_path, STIM_SECONDS, rng, fps=24)

    vocab = (
        "the quick brown fox jumps over a lazy dog while rain falls on hills".split()
    )
    n_words = int(STIM_SECONDS * WORDS_PER_SEC)
    words = [vocab[i % len(vocab)] for i in range(n_words)]
    contexts = [
        " ".join(words[max(0, i - CONTEXT_WORDS) : i + 1]) for i in range(n_words)
    ]

    text_backbone = build_text_backbone()
    t_text = bench_text(words, contexts, text_backbone)
    log(f"text (Llama-3.2-3B, {n_words} words): {t_text:.2f}s")
    audio_backbone = build_audio_backbone()
    t_audio = bench_audio(wav_path, audio_backbone)
    log(f"audio (w2v-bert-2.0, {STIM_SECONDS:.0f}s wav): {t_audio:.2f}s")
    # headline path: int8 (production default) unless BENCH_QUANTIZE=0
    quantize = os.environ.get("BENCH_QUANTIZE", "1") != "0"
    t_video_exact = None
    if have_video:
        video_backbone = build_video_backbone(quantize)
        t_video = bench_video(video_path, video_backbone)
        log(f"video (V-JEPA2 ViT-G, {int(2*STIM_SECONDS)} windows x 64 frames): {t_video:.2f}s")
        # headline: the production overlapped driver (all three backbones
        # resident — same as a real study run, where features keep their
        # backbones for the whole prepare pass)
        t_overlap = bench_overlapped(
            words, contexts, wav_path, video_path,
            text_backbone, audio_backbone, video_backbone,
        )
        log(f"trimodal overlapped prepare: {t_overlap:.2f}s "
            f"(sequential stage sum {t_text + t_audio + t_video:.2f}s)")
        del video_backbone
        gc.collect()
        if quantize and not os.environ.get("BENCH_SKIP_EXACT"):
            # recurring record of the exact-bf16 parity path (r4 verdict
            # weak #6): measure its video stage every run so its perf
            # cannot silently rot behind the int8 default
            exact_backbone = build_video_backbone(False)
            t_video_exact = bench_video(video_path, exact_backbone)
            log(f"video exact-bf16 (parity path): {t_video_exact:.2f}s")
            del exact_backbone
    else:
        t_video = 0.0
        t_overlap = None
        log("video: skipped (no encoder available for synthetic mkv)")
        # a bimodal number against a video-dominated baseline would be
        # ~8x inflated: mark the metric so the record cannot masquerade
        # as a trimodal result
    del text_backbone, audio_backbone
    gc.collect()

    if os.environ.get("BENCH_SKIP_TRAIN"):
        t_step = None
    else:
        t_step = bench_train()
        log(f"train (flagship 0.9B trunk, batch 16 trimodal): {t_step:.3f}s/step")

    sequential_total = t_text + t_audio + t_video
    # the headline measures the shipping path: overlapped prepare_features
    # (falls back to the sequential sum when video is unavailable)
    total = t_overlap if t_overlap is not None else sequential_total
    value = STIM_SECONDS / total
    metric = "stimulus-sec/sec/chip (trimodal feature extraction)"
    vs_baseline = round(value / A100_BASELINE_EST, 3)
    if not have_video:
        metric = "stimulus-sec/sec/chip (BIMODAL - video unavailable)"
        vs_baseline = 0.0  # not comparable to the video-dominated estimate
    # weather-normalized secondary value (r4 verdict weak #2): re-price the
    # text stage's contract-fixed 11.4 MB D2H fetch at the pinned 25 MB/s
    # reference rate, so round-over-round deltas are code, not tunnel
    # weather.  First-order: this fetch is the documented weather-sensitive
    # exposure (BENCH_NOTES r3b: text stage reads 0.7-1.1 s by weather);
    # under overlap it still serializes on the shared tunnel with video H2D.
    value_norm = None
    if have_video and d2h_mbps:
        correction = TEXT_D2H_MB / d2h_mbps - TEXT_D2H_MB / D2H_PINNED_MBPS
        value_norm = STIM_SECONDS / max(1e-6, total - correction)
        log(f"weather-normalized: {value_norm:.3f} st-s/s "
            f"(measured D2H {d2h_mbps:.0f} MB/s, pinned {D2H_PINNED_MBPS:.0f})")

    # exact-bf16 parity-path value, derived by shifting the overlapped wall
    # by the measured exact-vs-int8 video stage delta (the prepare is
    # video-bound, so the wall moves with the video stage)
    value_exact = None
    if t_video_exact is not None and t_overlap is not None:
        value_exact = STIM_SECONDS / (t_overlap + t_video_exact - t_video)

    record = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "stimulus_sec/s",
        "vs_baseline": vs_baseline,
        # honest under the charitable reading too (BASELINE.md sensitivity)
        "vs_tf32_scenario": round(value / A100_TF32_SCENARIO, 3) if have_video else 0.0,
        # self-describing record: which video path produced `value`
        # (int8 w8a8 fused is the production default since r4)
        "video_quantize": quantize,
        "d2h_mbps": round(d2h_mbps, 1) if d2h_mbps else None,
        "value_weather_normalized": round(value_norm, 3) if value_norm else None,
        "value_exact": round(value_exact, 3) if value_exact else None,
        "video_exact_seconds": (
            round(t_video_exact, 3) if t_video_exact is not None else None
        ),
        "overlapped_seconds": round(t_overlap, 3) if t_overlap is not None else None,
        "sequential_seconds": round(sequential_total, 3),
        "stage_seconds": {
            "text": round(t_text, 3),
            "audio": round(t_audio, 3),
            "video": round(t_video, 3),
        },
    }
    if t_step is not None:
        # secondary driver-visible metric: flagship training step time
        record["train_step_seconds"] = round(t_step, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # a dead axon tunnel (or any backend failure) must still produce a
        # parseable one-line record — BENCH_r03.json was a raw traceback
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "stimulus-sec/sec/chip (trimodal feature extraction)",
                    "value": None,
                    "unit": "stimulus_sec/s",
                    "vs_baseline": None,
                    "error": f"{type(e).__name__}: {e}",
                }
            )
        )
        sys.exit(1)
