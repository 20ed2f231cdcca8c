"""Audio length bucketing: one compile per bucket, masked parity.

ChunkEvents produces 30-60 s chunks of arbitrary duration; without
bucketing every distinct wav length is a fresh XLA compile (minutes each on
a remote backend).  The bucketed path zero-pads to a bucket width and masks
the padding out of the mel normalization and conformer attention, so its
valid outputs match the exact-length call.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from algonauts2025_tpu.features.audio import TARGET_SR, TinyAudioBackbone
from algonauts2025_tpu.ops.mel import log_mel_features, log_mel_features_masked


@pytest.fixture(scope="module")
def backbone():
    return TinyAudioBackbone(hidden_size=32, num_layers=2)


def _wav(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal(int(seconds * TARGET_SR)).astype(np.float32)


def test_masked_mel_matches_exact():
    wav = _wav(2.3)
    exact = np.asarray(log_mel_features(jnp.asarray(wav)))
    padded = np.zeros(4 * TARGET_SR, np.float32)
    padded[: len(wav)] = wav
    feats, t_valid = log_mel_features_masked(jnp.asarray(padded), np.int32(len(wav)))
    t = int(t_valid)
    assert t == exact.shape[0]
    np.testing.assert_allclose(np.asarray(feats)[:t], exact, atol=2e-4, rtol=1e-4)


def test_bucketed_states_match_exact(backbone):
    wav = _wav(3.7, seed=1)
    n_out = 7
    exact = backbone.hidden_states_2hz(wav, n_out)
    bucketed = backbone.hidden_states_2hz_bucketed(wav, n_out, 5 * TARGET_SR)
    assert bucketed.shape == exact.shape
    np.testing.assert_allclose(bucketed, exact, atol=2e-3, rtol=1e-3)


def test_one_compile_per_bucket(backbone):
    """Three different sub-bucket durations must share one compiled shape."""
    backbone.bucket_shapes.clear()
    for seconds, n_out in ((3.1, 6), (4.2, 8), (4.9, 10)):
        out = backbone.hidden_states_2hz_bucketed(
            _wav(seconds), n_out, 5 * TARGET_SR
        )
        assert out.shape[-1] == n_out
    assert len(backbone.bucket_shapes) == 1
    # a longer wav lands in the next bucket: exactly one more shape
    backbone.hidden_states_2hz_bucketed(_wav(7.5), 15, 10 * TARGET_SR)
    assert len(backbone.bucket_shapes) == 2


def test_feature_level_bucket_selection(tmp_path):
    """Wav2VecBert pads each chunk to the bucket grid end to end."""
    from algonauts2025_tpu.core.events import Sound
    from algonauts2025_tpu.features.audio import Wav2VecBert
    from algonauts2025_tpu.io import wav as wavio

    bb = TinyAudioBackbone(hidden_size=32, num_layers=1)
    feat = Wav2VecBert(model_name="tiny-random", bucket_seconds=5.0)
    feat.set_backbone(bb)
    events = []
    for i, seconds in enumerate((2.2, 3.9)):
        fp = tmp_path / f"w{i}.wav"
        wavio.write(fp, _wav(seconds, seed=i), TARGET_SR)
        events.append(Sound(start=0.0, timeline=f"t{i}", filepath=str(fp)))
    outs = [np.asarray(x) for x in feat._compute(events)]
    assert outs[0].shape[-1] == 4  # round(2.2 * 2 Hz)
    assert outs[1].shape[-1] == 8
    assert len(bb.bucket_shapes) == 1  # both hit the 5 s bucket
