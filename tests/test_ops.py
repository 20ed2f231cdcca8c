"""Ops: pooling parity with torch, layer agg, pearson, attention, resample."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algonauts2025_tpu.ops import (
    adaptive_avg_pool1d,
    aggregate_layers,
    apply_rotary,
    compute_pearson,
    dot_product_attention,
    fused_attention,
    init_pearson_state,
    pearson_corr,
    resample_poly,
    rotary_angles,
    update_pearson_state,
)


@pytest.mark.parametrize("n_in,n_out", [(298, 100), (300, 100), (100, 100), (7, 3)])
def test_adaptive_pool_matches_torch(n_in, n_out, rng):
    import torch

    x = rng.standard_normal((2, 5, n_in)).astype(np.float32)
    ours = adaptive_avg_pool1d(x, n_out)
    theirs = torch.nn.AdaptiveAvgPool1d(n_out)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_aggregate_layers_group_mean(rng):
    latents = rng.standard_normal((9, 4, 6)).astype(np.float32)
    out = aggregate_layers(latents, [0.5, 0.75, 1.0], "group_mean")
    # indices: [4, 6, 8] -> groups [4:6], [6:9]
    assert out.shape == (2, 4, 6)
    np.testing.assert_allclose(out[0], latents[4:6].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[1], latents[6:9].mean(0), atol=1e-6)
    # single layer
    out1 = aggregate_layers(latents, [1.0], "group_mean")
    assert out1.shape == (4, 6)
    out2 = aggregate_layers(latents, [1.0], None)
    assert out2.shape == (1, 4, 6)
    out3 = aggregate_layers(latents, [0.0, 1.0], None)
    assert out3.shape == (2, 4, 6)


def test_pearson_matches_scipy(rng):
    from scipy.stats import pearsonr

    x = rng.standard_normal((50, 4)).astype(np.float32)
    y = (x + 0.5 * rng.standard_normal((50, 4))).astype(np.float32)
    r = np.asarray(pearson_corr(jnp.asarray(x), jnp.asarray(y)))
    for d in range(4):
        expected = pearsonr(x[:, d], y[:, d])[0]
        assert r[d] == pytest.approx(expected, abs=1e-4)


def test_streaming_pearson_matches_batch(rng):
    x = rng.standard_normal((64, 6)).astype(np.float32)
    y = rng.standard_normal((64, 6)).astype(np.float32)
    state = init_pearson_state(6)
    for i in range(0, 64, 16):
        state = update_pearson_state(state, jnp.asarray(x[i : i + 16]), jnp.asarray(y[i : i + 16]))
    streaming = np.asarray(compute_pearson(state))
    direct = np.asarray(pearson_corr(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(streaming, direct, atol=1e-4)


def test_rotary_preserves_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 10, 16)).astype(np.float32))
    ang = jnp.asarray(rotary_angles(10, 8))
    y = apply_rotary(x, ang)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        atol=1e-4,
    )
    # position 0 is unrotated
    np.testing.assert_allclose(np.asarray(y[..., 0, :]), np.asarray(x[..., 0, :]), atol=1e-6)


def test_attention_softmax_property(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 5, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 5, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 5, 8)).astype(np.float32))
    out = dot_product_attention(q, k, v)
    assert out.shape == (1, 2, 5, 8)
    # attention output is a convex combination of values
    vmin = np.asarray(v).min(axis=2, keepdims=True)
    vmax = np.asarray(v).max(axis=2, keepdims=True)
    o = np.asarray(out)
    assert (o >= vmin - 1e-4).all() and (o <= vmax + 1e-4).all()


def test_fused_attention_matches_reference(rng):
    q = jnp.asarray(rng.standard_normal((2, 4, 37, 24)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 37, 24)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 37, 24)).astype(np.float32))
    ref = dot_product_attention(q, k, v)
    # run the pallas kernel in interpret mode on CPU
    from algonauts2025_tpu.ops.attention import _fused_attention_tpu

    out = _fused_attention_tpu(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("old,new", [(44100, 16000), (48000, 16000), (22050, 16000)])
def test_resample_tone(old, new):
    # a pure tone stays a pure tone with preserved amplitude
    dur = 1.0
    t_old = np.arange(int(old * dur)) / old
    x = np.sin(2 * np.pi * 440.0 * t_old).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), old, new))
    assert y.shape[-1] == int(len(x) * new / old)
    t_new = np.arange(len(y)) / new
    expected = np.sin(2 * np.pi * 440.0 * t_new)
    # ignore filter edges
    sl = slice(200, -200)
    err = np.abs(y[sl] - expected[sl]).max()
    assert err < 5e-3


def test_resample_identity():
    x = jnp.asarray(np.random.randn(1000).astype(np.float32))
    y = resample_poly(x, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _speech_like(n: int, sr: int, rng) -> np.ndarray:
    """AM-modulated harmonic stack + noise floor (voiced-speech stand-in)."""
    t = np.arange(n) / sr
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.5 * t))
    x = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 9))
    x = x * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("old_sr", [44100, 48000])
def test_resample_parity_scipy_polyphase(old_sr, rng):
    """Parity with an independent polyphase reference (scipy kaiser design,
    which julius documents closeness to) at the cache-contract rates.

    In-band content must agree tightly; full-band white noise is compared
    band-limited to 0.8x the target Nyquist because the two filter designs
    legitimately differ in the transition band (julius rolloff 0.945 vs
    scipy kaiser), not in the passband.
    """
    import math

    from scipy import signal

    new_sr = 16000
    g = math.gcd(old_sr, new_sr)
    n = old_sr * 2

    speech = _speech_like(n, old_sr, rng)
    noise = signal.sosfilt(
        signal.butter(8, 6400, fs=old_sr, output="sos"), rng.standard_normal(n)
    ).astype(np.float32)

    for x, rel_tol, corr_tol in ((speech, 0.02, 0.9999), (noise, 0.04, 0.999)):
        ours = np.asarray(resample_poly(jnp.asarray(x), old_sr, new_sr))
        ref = signal.resample_poly(x.astype(np.float64), new_sr // g, old_sr // g)
        m = min(len(ours), len(ref))
        assert abs(len(ours) - len(ref)) <= 1
        a, b = ours[200 : m - 200], ref[200 : m - 200]
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < rel_tol, rel
        assert np.corrcoef(a, b)[0, 1] > corr_tol


def test_flash_attention_matches_reference(rng):
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((2, 3, 512, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, 512, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, 512, 32)).astype(np.float32))
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, q_block=128, kv_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_rel_bias_onehot_matmul(rng):
    """The banded one-hot matmul places each clamped diagonal exactly."""
    from algonauts2025_tpu.models.backbones.wav2vec_bert import _rel_onehot

    t, left, right = 37, 8, 2
    qd = jnp.asarray(rng.standard_normal((2, 4, t, left + right + 1)).astype(np.float32))
    rel_m = _rel_onehot(t, left, right)
    out = np.asarray(
        jnp.einsum(
            "bhlp,lpr->bhlr",
            qd,
            rel_m,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    qd_np = np.asarray(qd)
    for l in range(t):
        for r in range(t):
            p = int(np.clip(r - l, -left, right)) + left
            np.testing.assert_allclose(out[..., l, r], qd_np[..., l, p], rtol=1e-6)


def test_pallas_attention_grad_matches_xla(rng):
    """Custom VJP of the fused kernel == autodiff of the XLA reference."""
    from algonauts2025_tpu.ops import attention as att

    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))

    def loss_ref(q, k, v):
        return (att.dot_product_attention(q, k, v) ** 2).sum()

    # drive the custom backward directly (forward uses interpret mode off-TPU
    # is unavailable, so compare the bwd math against autodiff)
    out, vjp = jax.vjp(att.dot_product_attention, q, k, v)
    g = jnp.ones_like(out)
    ref_grads = vjp(g)
    got_grads = att._pallas_attention_bwd((q, k, v), g)
    for a, b in zip(got_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_attention_causal_masked(rng):
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 2, 2, 256, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([200, 256], jnp.int32)

    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    keymask = (jnp.arange(t)[None, None, None] < lengths[:, None, None, None])
    ref = dot_product_attention(q, k, v, mask=causal & keymask)
    out = flash_attention(
        q, k, v, q_block=64, kv_block=128, causal=True, lengths=lengths,
        interpret=True,
    )
    valid_rows = np.asarray(keymask)[:, 0, 0, :]  # padded q rows are junk
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(out)[bi, :, valid_rows[bi]],
            np.asarray(ref)[bi, :, valid_rows[bi]],
            atol=2e-3,
        )


def test_flash_attention_awkward_t_and_full_head_dim(rng):
    """Fast-path guards: kv-block widening must keep dividing T (t=768
    would otherwise silently drop the trailing keys), and d % 128 == 0
    must not take the ones-lane path (it would double the padded width)."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    for t, d in ((768, 16), (256, 128)):
        q = jnp.asarray(rng.standard_normal((1, 2, t, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 2, t, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 2, t, d)).astype(np.float32))
        ref = dot_product_attention(q, k, v)
        out = flash_attention(q, k, v, q_block=256, kv_block=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_attention_zero_length_row(rng):
    """A batch row with lengths == 0 must produce zeros, not a uniform
    average of the padded values."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 2, 2, 256, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([0, 256], jnp.int32)
    out = flash_attention(
        q, k, v, q_block=64, kv_block=128, lengths=lengths, interpret=True
    )
    assert np.abs(np.asarray(out)[0]).max() == 0.0
    assert np.abs(np.asarray(out)[1]).max() > 0.0


def test_flash_attention_packed_matches_reference(rng):
    from algonauts2025_tpu.ops.flash_attention import flash_attention_packed

    q = jnp.asarray(rng.standard_normal((1, 4, 512, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 4, 512, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 4, 512, 64)).astype(np.float32))
    ref = dot_product_attention(q, k, v)
    out = flash_attention_packed(q, k, v, q_block=128, kv_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_attention_pathological_norms_fallback(rng):
    """Orthogonal large-norm q/k overshoot the raw Cauchy-Schwarz shift by
    >87 nats, which would underflow every exp and silently zero the rows;
    the lb+55 clamp on the shift must keep the output exact (uniform
    average of V here, since all scores are ~0)."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    t, d = 1024, 64
    # q in the first 32 dims, k in the last 32: q.k == 0 while |q||k|/8 ~ 1e4
    q = np.zeros((1, 1, t, d), np.float32)
    k = np.zeros((1, 1, t, d), np.float32)
    q[..., :32] = rng.standard_normal((1, 1, t, 32)) * 60.0
    k[..., 32:] = rng.standard_normal((1, 1, t, 32)) * 60.0
    q, k = jnp.asarray(q), jnp.asarray(k)
    v = jnp.asarray(rng.standard_normal((1, 1, t, d)).astype(np.float32))
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    # scores are all ~0 -> softmax is uniform -> output = mean of v
    ref = np.asarray(v).mean(axis=2, keepdims=True)
    assert np.abs(out).max() > 0, "fallback did not engage: all-zero output"
    np.testing.assert_allclose(out, np.broadcast_to(ref, out.shape), atol=2e-2)


@pytest.mark.parametrize("t", [1024, 1536, 2048])
def test_flash_attention_default_blocks_across_lengths(t, rng):
    """The default-argument fast path (block auto-growth + qb override)
    must stay exact at every supported sequence length."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    q = jnp.asarray(rng.standard_normal((1, 2, t, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, t, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, t, 64)).astype(np.float32))
    ref = dot_product_attention(q, k, v)
    # mirror the callers' _pick_block contract: blocks must divide T
    kwargs = {} if t % 1024 == 0 else {"q_block": 512, "kv_block": 512}
    out = flash_attention(q, k, v, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_attention_short_valid_kv_clamp(rng):
    """The masked kv-block clamp (skip blocks entirely beyond `valid`) must
    be exact for non-block-aligned short lengths, including valid < one
    kv block."""
    from algonauts2025_tpu.ops.flash_attention import flash_attention

    b, h, t, d = 2, 2, 512, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([37, 130], jnp.int32)  # << T, not block-aligned
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    keymask = jnp.arange(t)[None, None, None] < lengths[:, None, None, None]
    ref = dot_product_attention(q, k, v, mask=causal & keymask)
    out = flash_attention(
        q, k, v, q_block=64, kv_block=128, causal=True, lengths=lengths,
        interpret=True,
    )
    valid_rows = np.asarray(keymask)[:, 0, 0, :]
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(out)[bi, :, valid_rows[bi]],
            np.asarray(ref)[bi, :, valid_rows[bi]],
            atol=2e-3,
        )


def test_dot_product_attention_fully_masked_row_zeros(rng):
    """A fully-masked row returns zeros (flash-kernel parity), not the
    uniform mean of V."""
    from algonauts2025_tpu.ops.attention import dot_product_attention as dpa

    b, h, t, d = 1, 2, 8, 4
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    mask = jnp.ones((b, h, t, t), bool).at[:, :, 3].set(False)  # row 3 masked
    out = np.asarray(dpa(q, k, v, mask=mask))
    np.testing.assert_array_equal(out[:, :, 3], 0.0)
    assert np.abs(out[:, :, 0]).sum() > 0  # other rows unaffected


def test_fused_attention_force_pallas_rejects_mask(rng):
    from algonauts2025_tpu.ops.attention import fused_attention

    x = jnp.zeros((1, 1, 8, 4), jnp.float32)
    mask = jnp.ones((1, 1, 8, 8), bool)
    with pytest.raises(ValueError, match="incompatible with a mask"):
        fused_attention(x, x, x, mask=mask, force_pallas=True)


def test_apply_rotary_preserves_dtype(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ang = jnp.asarray(rotary_angles(8, 8))
    assert apply_rotary(x, ang).dtype == jnp.bfloat16
