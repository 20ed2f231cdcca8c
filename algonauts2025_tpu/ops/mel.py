"""Kaldi-style log-mel filterbank frontend (SeamlessM4T parity), on device.

The reference feeds HF's SeamlessM4TFeatureExtractor (NumPy, frame-by-frame)
into w2v-bert (reference features/audio.py:219-234).  Here the whole
frontend — framing, DC removal, pre-emphasis, povey window, rFFT, kaldi mel
projection, log, per-bin normalization, 2-frame stacking — is one jittable
JAX function: the mel projection is a matmul on the MXU and XLA fuses the
elementwise chain, so the frontend rides along with backbone inference
instead of running on the host.

Constants match HF feature_extraction_seamless_m4t.py: 400/160 frames,
512-point FFT, 80 kaldi mel bins in [20, 8000] Hz, mel floor 2^-23,
waveform scaled to 16-bit range.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["log_mel_features", "log_mel_features_masked", "mel_filter_bank_kaldi", "povey_window"]


def _hz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def mel_filter_bank_kaldi(
    num_frequency_bins: int = 257,
    num_mel_filters: int = 80,
    min_frequency: float = 20.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = 16000,
) -> np.ndarray:
    """(num_frequency_bins, num_mel_filters) triangular filters built in mel
    space (triangularize_in_mel_space=True, norm=None)."""
    mel_min = _hz_to_mel_kaldi(min_frequency)
    mel_max = _hz_to_mel_kaldi(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    # fft bin frequencies mapped into mel space
    fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
    fft_freqs = _hz_to_mel_kaldi(fft_bin_width * np.arange(num_frequency_bins))
    filter_diff = np.diff(mel_freqs)
    slopes = np.expand_dims(mel_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def povey_window(length: int = 400) -> np.ndarray:
    """Kaldi povey window: hann(periodic=False)^0.85."""
    n = np.arange(length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / (length - 1))
    return (hann**0.85).astype(np.float32)


def _log_mel(
    waveform: jax.Array,
    frame_length: int,
    hop_length: int,
    fft_length: int,
    stride: int,
    n_valid: jax.Array | None,
):
    waveform = waveform.astype(jnp.float32) * 32768.0
    n = waveform.shape[-1]
    num_frames = 1 + (n - frame_length) // hop_length
    idx = jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(frame_length)[None]
    frames = waveform[idx]  # (F, frame_length)
    # remove DC offset per frame
    frames = frames - frames.mean(axis=-1, keepdims=True)
    # pre-emphasis 0.97 (first sample scaled, HF audio_utils parity)
    pre = jnp.concatenate(
        [frames[:, :1] * (1 - 0.97), frames[:, 1:] - 0.97 * frames[:, :-1]], axis=-1
    )
    windowed = pre * jnp.asarray(povey_window(frame_length))
    spec = jnp.fft.rfft(windowed, n=fft_length, axis=-1)
    power = jnp.abs(spec) ** 2  # (F, fft/2+1)
    fb = jnp.asarray(mel_filter_bank_kaldi(fft_length // 2 + 1))
    mel = power @ fb  # MXU matmul
    mel = jnp.log(jnp.maximum(mel, 1.192092955078125e-07))
    # per-mel-bin normalization over time (ddof=1); with ``n_valid`` the
    # statistics come from the valid (un-padded) frames only, so a
    # zero-padded bucket normalizes exactly like the exact-length call
    if n_valid is None:
        n_frames_valid = jnp.asarray(num_frames, jnp.int32)
        mean = mel.mean(axis=0, keepdims=True)
        var = mel.var(axis=0, ddof=1, keepdims=True)
    else:
        n_frames_valid = 1 + (jnp.asarray(n_valid, jnp.int32) - frame_length) // hop_length
        n_frames_valid = jnp.clip(n_frames_valid, 1, num_frames)
        keep = (jnp.arange(num_frames) < n_frames_valid)[:, None]
        denom = n_frames_valid.astype(jnp.float32)
        mean = jnp.sum(jnp.where(keep, mel, 0.0), axis=0, keepdims=True) / denom
        sq = jnp.where(keep, (mel - mean) ** 2, 0.0)
        var = jnp.sum(sq, axis=0, keepdims=True) / jnp.maximum(denom - 1.0, 1.0)
    mel = (mel - mean) / jnp.sqrt(var + 1e-7)
    # stack `stride` frames
    t = (mel.shape[0] // stride) * stride
    stacked = mel[:t].reshape(t // stride, mel.shape[1] * stride)
    return stacked, n_frames_valid // stride


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "hop_length", "fft_length", "stride"),
)
def log_mel_features(
    waveform: jax.Array,
    frame_length: int = 400,
    hop_length: int = 160,
    fft_length: int = 512,
    stride: int = 2,
) -> jax.Array:
    """(T,) float32 mono 16 kHz waveform -> (T', 80*stride) features.

    Matches SeamlessM4TFeatureExtractor with do_normalize_per_mel_bins=True
    and pad_to_multiple_of handled by the stride trim.
    """
    feats, _ = _log_mel(waveform, frame_length, hop_length, fft_length, stride, None)
    return feats


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "hop_length", "fft_length", "stride"),
)
def log_mel_features_masked(
    waveform: jax.Array,
    n_valid: jax.Array,
    frame_length: int = 400,
    hop_length: int = 160,
    fft_length: int = 512,
    stride: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Length-bucketed variant: ``waveform`` is zero-padded to a bucket
    width, ``n_valid`` is the true sample count.  Returns (features,
    valid_feature_frames); normalization statistics use valid frames only.
    """
    return _log_mel(waveform, frame_length, hop_length, fft_length, stride, n_valid)
