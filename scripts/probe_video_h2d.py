"""Measured decision for the video H2D frame-dedup lever (r3 VERDICT #4a).

The production video stage ships every sampled frame ~8x (consecutive
2 Hz windows over a 4 s context share 56/64 frames at the aligned 16 fps
sampling grid): ~12.6 MB/window H2D vs ~1.6 MB/window deduped.  Whether
shipping frames once and assembling windows device-side is worth building
depends entirely on how much of that H2D (plus host decode) is EXPOSED
past the existing 2-deep async pipeline.

Three timed passes over the same stimulus, same int8 backbone:
  A  production: decode + H2D + compute, 2-deep pipeline (bench_video's loop)
  C  pre-decoded windows on host: H2D + compute only
  B  pre-staged device batches: compute floor

A-C = exposed decode, C-B = exposed H2D, (A-B)/A = total exposure.
Decision rule (r3 verdict): build the dedup only if its addressable share
(C-B, the H2D part) exceeds 3% of A.  Run on chip attach:
    python scripts/probe_video_h2d.py        # BENCH_STIM_SECONDS=12 default
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    print("devices:", jax.devices(), file=sys.stderr)
    from algonauts2025_tpu.data.synthetic import _write_video
    from algonauts2025_tpu.features.video import (
        JaxVideoBackbone,
        _calibrated_static_model,
    )
    from algonauts2025_tpu.io.video import VideoClip
    from algonauts2025_tpu.models.backbones.vjepa2 import VJEPA2_VITG, VJEPA2Backbone
    from pathlib import Path
    import tempfile

    stim_seconds = float(os.environ.get("BENCH_STIM_SECONDS", 12))
    tmp = Path(tempfile.mkdtemp())
    video_path = tmp / "stim.mkv"
    rng = np.random.default_rng(0)
    if not _write_video(video_path, stim_seconds, rng, fps=24):
        raise SystemExit("no video encoder available")

    cfg = dataclasses.replace(VJEPA2_VITG, quantize=True, quant_static=True)
    model = VJEPA2Backbone(cfg, token_pool=True)
    crop = cfg.crop_size
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, cfg.frames_per_clip, crop, crop, 3)))[
            "params"
        ]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
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
    backbone = JaxVideoBackbone(model, params, n_frames=64, crop_size=crop)
    wb = int(os.environ.get("BENCH_WB", 4))

    clip = VideoClip(str(video_path))
    times = np.linspace(0, clip.duration, int(2 * clip.duration) + 1)[1:]
    first = next(clip.sliding_windows(times[:1], 64, 4.0))
    backbone.encode_windows(np.broadcast_to(first[None], (wb,) + first.shape).copy())
    clip.close()

    def batches_from_decode():
        clip = VideoClip(str(video_path))
        batch = []
        for window in clip.sliding_windows(times, 64, 4.0):
            batch.append(window)
            if len(batch) == wb:
                yield np.stack(batch)
                batch = []
        if batch:
            while len(batch) < wb:
                batch.append(batch[-1])
            yield np.stack(batch)
        clip.close()

    def run_pipelined(stacks) -> float:
        t0 = time.time()
        pending = []
        for stack in stacks:
            pending.append(backbone.encode_windows_async(stack))
            while len(pending) > 2:
                np.asarray(pending.pop(0))
        while pending:
            np.asarray(pending.pop(0))
        return time.time() - t0

    def median3(f):
        vals = sorted(f() for _ in range(3))
        return vals[1]

    # A: production (decode + H2D + compute)
    t_a = median3(lambda: run_pipelined(batches_from_decode()))
    print(f"A production (decode+H2D+compute): {t_a:.3f}s", file=sys.stderr)

    # C: pre-decoded host windows (H2D + compute)
    host_batches = list(batches_from_decode())
    n_bytes = sum(b.nbytes for b in host_batches)
    t_c = median3(lambda: run_pipelined(iter(host_batches)))
    print(f"C pre-decoded ({n_bytes/1e6:.0f} MB H2D): {t_c:.3f}s", file=sys.stderr)

    # B: pre-staged device batches (compute floor)
    dev_batches = [jax.device_put(b) for b in host_batches]
    jax.block_until_ready(dev_batches)
    t_b = median3(lambda: run_pipelined(iter(dev_batches)))
    print(f"B device-resident (compute floor): {t_b:.3f}s", file=sys.stderr)

    exposure = (t_a - t_b) / t_a
    h2d_share = (t_c - t_b) / t_a
    decision = "BUILD dedup" if h2d_share > 0.03 else "do not build (hidden)"
    print(
        {
            "stim_seconds": stim_seconds,
            "A_production_s": round(t_a, 3),
            "C_h2d_compute_s": round(t_c, 3),
            "B_compute_floor_s": round(t_b, 3),
            "decode_exposure": round((t_a - t_c) / t_a, 4),
            "h2d_exposure": round(h2d_share, 4),
            "total_exposure": round(exposure, 4),
            "decision": decision,
        }
    )


if __name__ == "__main__":
    main()
