"""int8 inference path (opt-in): matmul fidelity and backbone drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algonauts2025_tpu.ops.quant import (
    int8_matmul,
    quantize_dense_params,
    quantize_tree,
    quantize_weight,
)


def test_int8_matmul_close_to_float(rng):
    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 96)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    ours = np.asarray(int8_matmul(x, w_q, scale))
    ref = np.asarray(x @ w)
    rel = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel  # w8a8 on gaussian data: ~1% relative error


def test_quantize_stacked_scan_params(rng):
    stacked = {"kernel": rng.standard_normal((3, 16, 8)).astype(np.float32),
               "bias": np.zeros((3, 8), np.float32)}
    q = quantize_dense_params(stacked)
    assert q["kernel_q"].shape == (3, 16, 8) and q["kernel_q"].dtype == jnp.int8
    assert q["scale"].shape == (3, 8)  # per-layer, per-column scales


def test_quantized_backbone_matches_float():
    """Convert a float tiny ViT's params to int8 and compare end to end."""
    from algonauts2025_tpu.models.backbones.vjepa2 import (
        VJEPA2Backbone,
        VJEPA2Config,
    )
    import dataclasses

    cfg = VJEPA2Config(
        crop_size=32, patch_size=16, tubelet_size=2, frames_per_clip=4,
        hidden_size=64, num_layers=2, num_heads=4, mlp_ratio=2.0,
        dtype=jnp.float32,
    )
    model = VJEPA2Backbone(cfg, token_pool=True)
    pixels = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), pixels)["params"]
    ref = np.asarray(model.apply({"params": params}, pixels))

    qcfg = dataclasses.replace(cfg, quantize=True)
    qmodel = VJEPA2Backbone(qcfg, token_pool=True)
    qparams = quantize_tree(params)
    out = np.asarray(qmodel.apply({"params": qparams}, pixels))

    assert out.shape == ref.shape
    a = ref.reshape(-1, ref.shape[-1])
    b = out.reshape(-1, out.shape[-1])
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.98, cos.min()


def test_feature_config_quantize_is_cache_relevant():
    """quantize changes feature values -> must be part of the cache uid."""
    from algonauts2025_tpu.config.uid import config_uid
    from algonauts2025_tpu.features.video import VJEPA2

    a = VJEPA2(model_name="tiny-random")
    # int8 is the default since r4: opting OUT (exact bf16) is the
    # non-default universe that must get its own uid
    b = VJEPA2(model_name="tiny-random", quantize=False)
    assert config_uid(a) != config_uid(b)
    # explicitly passing the default == omitting it (exca uid contract)
    assert config_uid(a) == config_uid(
        VJEPA2(model_name="tiny-random", quantize=True, quant_static=True)
    )
    # window_batch, by contrast, never changes values
    c = VJEPA2(model_name="tiny-random", window_batch=8)
    assert config_uid(a) == config_uid(c)


def test_static_scale_calibration_matches_dynamic():
    """Calibrated static activation scales track the dynamic-quant output."""
    from algonauts2025_tpu.models.backbones.vjepa2 import (
        VJEPA2Backbone,
        VJEPA2Config,
    )
    from algonauts2025_tpu.ops.quant import calibrate_quant_scales
    import dataclasses

    cfg = VJEPA2Config(
        crop_size=32, patch_size=16, tubelet_size=2, frames_per_clip=4,
        hidden_size=64, num_layers=2, num_heads=4, mlp_ratio=2.0,
        dtype=jnp.float32, quantize=True,
    )
    dyn_model = VJEPA2Backbone(cfg, token_pool=True)
    pixels = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    params = dyn_model.init(jax.random.PRNGKey(0), pixels)["params"]
    dyn = np.asarray(dyn_model.apply({"params": params}, pixels))

    # calibrate on the dynamic model (static with a_scale=0 would corrupt
    # deeper-layer statistics), then run the static model
    cparams = calibrate_quant_scales(dyn_model.apply, params, pixels, margin=1.0)
    a_scales = cparams["layers"]["attn"]["query"]["a_scale"]
    assert a_scales.shape == (2,) and np.all(np.asarray(a_scales) > 0)

    scfg = dataclasses.replace(cfg, quant_static=True)
    static_model = VJEPA2Backbone(scfg, token_pool=True)
    static = np.asarray(static_model.apply({"params": cparams}, pixels))

    assert static.shape == dyn.shape
    a = dyn.reshape(-1, dyn.shape[-1])
    b = static.reshape(-1, static.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert cos.min() > 0.98, cos.min()


def test_video_feature_static_quant_end_to_end(tmp_path):
    """The VJEPA2 feature computes finite features with static int8 scales,
    and quant_static is part of the cache identity."""
    from algonauts2025_tpu.config.uid import config_uid
    from algonauts2025_tpu.features.video import TinyVideoBackbone, VJEPA2

    feat_dyn = VJEPA2(model_name="tiny-random", quantize=True, quant_static=False)
    feat_static = VJEPA2(model_name="tiny-random", quantize=True, quant_static=True)
    assert config_uid(feat_dyn) != config_uid(feat_static)

    bb = TinyVideoBackbone(quantize=True, quant_static=True)
    import jax

    pixels = jax.random.uniform(jax.random.PRNGKey(3), (1, 8, 32, 32, 3))
    out = np.asarray(bb.encode_windows(pixels))
    assert np.isfinite(out).all()
    # and the calibration wiring must actually track the dynamic-quant
    # output (a_scale=0 saturation would produce finite garbage here)
    dyn = np.asarray(
        TinyVideoBackbone(quantize=True, quant_static=False).encode_windows(pixels)
    )
    a = out.reshape(-1, out.shape[-1]).astype(np.float64)
    b = dyn.reshape(-1, dyn.shape[-1]).astype(np.float64)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    )
    assert cos.min() > 0.98, cos.min()


def test_fused_matmul_matches_unfused(rng):
    """int8_matmul_fused (interpret mode) must reproduce int8_matmul's
    static-scale results exactly: same round/clip, same int32 accumulation."""
    from algonauts2025_tpu.ops.quant import int8_matmul_fused

    for m, k, n in [(64, 256, 128), (130, 384, 640)]:
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        w_q, w_scale = quantize_weight(w)
        bias = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        sx = jnp.float32(np.abs(np.asarray(x, np.float32)).max() / 127.0)
        ref = np.asarray(int8_matmul(x, w_q, w_scale, x_scale=sx) + bias)
        got = np.asarray(
            int8_matmul_fused(
                x, w_q, w_scale, sx, bias=bias, out_dtype=jnp.float32, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, atol=5e-6 * np.abs(ref).max())


def test_fused_mlp_matches_unfused_chain(rng):
    """int8_mlp_fused == fc1 -> exact gelu -> fc2 with the same quant
    decisions (f32 hidden, static scales)."""
    from algonauts2025_tpu.ops.quant import int8_mlp_fused

    m, k, f = 96, 256, 512
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16)
    w1q, s1 = quantize_weight(rng.standard_normal((k, f)).astype(np.float32) * 0.05)
    w2q, s2 = quantize_weight(rng.standard_normal((f, k)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng.standard_normal((k,)).astype(np.float32)) * 0.1
    sx = jnp.float32(np.abs(np.asarray(x, np.float32)).max() / 127.0)
    h = int8_matmul(x, w1q, s1, x_scale=sx) + b1
    h = jax.nn.gelu(h, approximate=False)
    sh = jnp.float32(np.abs(np.asarray(h)).max() / 127.0)
    ref = np.asarray(int8_matmul(h, w2q, s2, x_scale=sh) + b2)
    got = np.asarray(
        int8_mlp_fused(
            x, w1q, s1, b1, w2q, s2, b2, sx, sh,
            bm=128, fchunk=256, out_dtype=jnp.float32, interpret=True,
        )
    )
    # the erf polynomial (1.5e-7 abs) + fp32 mul-order are the only deltas
    np.testing.assert_allclose(got, ref, atol=1e-4 * np.abs(ref).max())


def test_gelu_erf_approx_accuracy():
    from algonauts2025_tpu.ops.quant import _gelu_erf_approx

    x = jnp.linspace(-8, 8, 4097, dtype=jnp.float32)
    ref = np.asarray(jax.nn.gelu(x, approximate=False))
    got = np.asarray(_gelu_erf_approx(x))
    assert np.abs(got - ref).max() < 2e-6


def test_uncalibrated_static_scale_poisons_with_nan(rng):
    """a_scale == 0 (the uncalibrated sentinel) must produce NaN, not the
    plausible finite garbage of everything saturating to +/-127 — cached
    features would be silently poisoned otherwise."""
    from algonauts2025_tpu.ops.quant import int8_matmul_fused, int8_mlp_fused

    m, k, n = 32, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16)
    w_q, w_scale = quantize_weight(rng.standard_normal((k, n)).astype(np.float32))
    zero = jnp.float32(0.0)
    out = np.asarray(int8_matmul(x, w_q, w_scale, x_scale=zero))
    assert np.isnan(out).all()
    out = np.asarray(
        int8_matmul_fused(x, w_q, w_scale, zero, out_dtype=jnp.float32, interpret=True)
    )
    assert np.isnan(out).all()
    # fused MLP: either scale zero poisons the OUTPUT even though the int8
    # cast in between could launder a NaN hidden state
    w2q, s2 = quantize_weight(rng.standard_normal((n, k)).astype(np.float32))
    b1 = jnp.zeros((n,), jnp.float32)
    b2 = jnp.zeros((k,), jnp.float32)
    good = jnp.float32(np.abs(np.asarray(x, np.float32)).max() / 127.0)
    for sx, sh in [(zero, good), (good, zero)]:
        out = np.asarray(
            int8_mlp_fused(
                x, w_q, w_scale, b1, w2q, s2, b2, sx, sh,
                bm=32, fchunk=128, out_dtype=jnp.float32, interpret=True,
            )
        )
        assert np.isnan(out).all(), (float(sx), float(sh))
    # dynamic path (x_scale=None) is unaffected
    out = np.asarray(int8_matmul(x, w_q, w_scale))
    assert np.isfinite(out).all()


def test_quant_dense_honors_static_a_scale(rng):
    """QuantDense.apply must route a calibrated a_scale into int8_matmul —
    silently falling back to dynamic per-row scales erases the int8 gain
    and skips the NaN-poison calibration guard (r4 review)."""
    from algonauts2025_tpu.ops.quant import (
        QuantDense,
        int8_matmul,
        quantize_dense_params,
    )

    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    qp = quantize_dense_params({"kernel": w, "bias": b})
    a_scale = jnp.asarray(float(np.abs(np.asarray(x)).max() / 127.0))
    got = QuantDense.apply({**qp, "a_scale": a_scale}, x, out_dtype=jnp.float32)
    want = int8_matmul(x, qp["kernel_q"], qp["scale"], x_scale=a_scale) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # an UNCALIBRATED tree (quantize_dense_params seeds a_scale=NaN) must
    # poison the output — that's the guard the old dynamic fallback skipped
    poisoned = QuantDense.apply(qp, x, out_dtype=jnp.float32)
    assert np.isnan(np.asarray(poisoned)).all()
    # a tree genuinely without a_scale uses the dynamic per-row path
    dyn_params = {k: v for k, v in qp.items() if k != "a_scale"}
    dyn = QuantDense.apply(dyn_params, x, out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(dyn)).all()
