"""Backbone numerical parity vs HF torch implementations (random weights)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_llama():
    """A small random HF LlamaModel + matching JAX config."""
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaModel

    from algonauts2025_tpu.models.backbones.llama import LlamaBackbone, LlamaConfig

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        max_position_embeddings=16384,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = LlamaModel(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        rope_theta=500000.0,
        dtype=jnp.float32,
    )
    model = LlamaBackbone(cfg)
    return hf_model, model, cfg


def test_llama_parity_full_mask(small_llama):
    import torch

    from algonauts2025_tpu.models.backbones.llama import params_from_hf

    hf_model, model, cfg = small_llama
    params = params_from_hf(hf_model.state_dict(), cfg)
    ids = np.array([[1, 5, 9, 2, 77, 3], [4, 8, 15, 16, 23, 42]], dtype=np.int32)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long), output_hidden_states=True
        )
    ref = np.stack([h.numpy() for h in out.hidden_states])  # (L+1, B, T, D)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_llama_parity_padded(small_llama):
    import torch

    from algonauts2025_tpu.models.backbones.llama import params_from_hf

    hf_model, model, cfg = small_llama
    params = params_from_hf(hf_model.state_dict(), cfg)
    ids = np.array([[1, 5, 9, 0, 0, 0], [4, 8, 15, 16, 23, 42]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=np.int32)
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    ref = np.stack([h.numpy() for h in out.hidden_states])
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # compare only valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        ours[:, valid], ref[:, valid], atol=2e-4, rtol=1e-3
    )


def test_wav2vec_bert_parity():
    import torch
    from transformers import Wav2Vec2BertConfig as HFW2VConfig
    from transformers import Wav2Vec2BertModel

    from algonauts2025_tpu.models.backbones.wav2vec_bert import (
        Wav2VecBertBackbone,
        Wav2VecBertConfig,
        params_from_hf,
    )

    hf_cfg = HFW2VConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        feature_projection_input_dim=20,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=2,
        position_embeddings_type="relative_key",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
        mask_time_prob=0.0,
        mask_feature_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = Wav2Vec2BertModel(hf_cfg).eval()
    cfg = Wav2VecBertConfig(
        input_dim=20,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        conv_kernel_size=7,
        left_max_pos=8,
        right_max_pos=2,
        dtype=jnp.float32,
    )
    model = Wav2VecBertBackbone(cfg)
    params = params_from_hf(hf_model.state_dict(), cfg)
    feats = np.random.default_rng(0).standard_normal((2, 12, 20)).astype(np.float32)
    with torch.no_grad():
        out = hf_model(
            input_features=torch.from_numpy(feats), output_hidden_states=True
        )
    ref = np.stack([h.numpy() for h in out.hidden_states])
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(feats)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_vjepa2_parity():
    import torch
    from transformers import VJEPA2Config as HFVJConfig
    from transformers.models.vjepa2.modeling_vjepa2 import VJEPA2Model

    from algonauts2025_tpu.models.backbones.vjepa2 import (
        VJEPA2Backbone,
        VJEPA2Config,
        params_from_hf,
    )

    hf_cfg = HFVJConfig(
        crop_size=32,
        patch_size=16,
        tubelet_size=2,
        frames_per_clip=4,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        mlp_ratio=2.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        # predictor params (unused by the encoder) kept small
        pred_hidden_size=32,
        pred_num_attention_heads=2,
        pred_num_hidden_layers=1,
        pred_num_mask_tokens=2,
    )
    torch.manual_seed(0)
    hf_model = VJEPA2Model(hf_cfg).eval()
    cfg = VJEPA2Config(
        crop_size=32,
        patch_size=16,
        tubelet_size=2,
        frames_per_clip=4,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        mlp_ratio=2.0,
        dtype=jnp.float32,
    )
    model = VJEPA2Backbone(cfg)
    params = params_from_hf(hf_model.state_dict(), cfg)
    pixels = np.random.default_rng(0).standard_normal((2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf_model(
            pixel_values_videos=torch.from_numpy(
                pixels.transpose(0, 1, 4, 2, 3)  # (B, T, C, H, W)
            ),
            output_hidden_states=True,
            skip_predictor=True,
        )
    ref = np.stack([h.numpy() for h in out.hidden_states])
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(pixels)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_mel_frontend_parity():
    from transformers import SeamlessM4TFeatureExtractor

    from algonauts2025_tpu.ops.mel import log_mel_features

    fe = SeamlessM4TFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (0.3 * np.sin(np.linspace(0, 700, 16000)) + 0.05 * rng.standard_normal(16000)).astype(
        np.float32
    )
    ref = fe(wav, sampling_rate=16000, return_tensors="np", padding=False)
    ref_feats = ref["input_features"][0]
    ours = np.asarray(log_mel_features(jnp.asarray(wav)))
    assert ours.shape == ref_feats.shape
    np.testing.assert_allclose(ours, ref_feats, atol=2e-3, rtol=1e-3)


def test_llama_right_padding_contract_poisons_left_pad(small_llama):
    """Masks must be right-padded: the TPU flash path masks columns >=
    lengths, so a left-padded row would silently attend to pad tokens on
    TPU while the XLA fallback stayed correct.  The backbone NaN-poisons
    violating rows on every backend instead."""
    import jax

    _hf, model, _cfg = small_llama
    ids = np.array([[1, 5, 9, 2, 0, 0], [0, 0, 4, 8, 15, 16]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [0, 0, 1, 1, 1, 1]], dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    out = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert np.isfinite(out[:, 0]).all()  # right-padded row: normal states
    assert np.isnan(out[1:, 1]).all()  # left-padded row: loudly poisoned
