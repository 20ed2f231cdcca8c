"""Wav2VecBert audio feature: frozen conformer states on the 2 Hz grid.

Rebuild of reference data_utils/data_utils/features/audio.py:27-263.  Per
Sound event: stereo->mono mean, global z-score (audio.py:123-127),
polyphase resample to 16 kHz (julius replacement -> ops.resample, on
device), kaldi log-mel frontend (ops.mel, fused under jit), frozen
conformer hidden states, nearest-neighbor resampling of the (L+1, D, T50)
stack onto the 2 Hz grid (torch F.interpolate default-mode parity,
audio.py:163-171).  Cached per (filepath, offset, duration).
"""

from __future__ import annotations

import logging
import typing as tp

import numpy as np
import pydantic

from ..core.events import Event, Sound, Video
from ..core.timed import Frequency, TimedArray
from .base import LayeredFeatureBase

logger = logging.getLogger(__name__)

__all__ = ["Wav2VecBert", "AudioBackbone", "TinyAudioBackbone"]

TARGET_SR = 16000
OUTPUT_HZ = 2.0


def nearest_resample(x: np.ndarray, n_out: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') over the last axis."""
    n_in = x.shape[-1]
    idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(int)
    idx = np.clip(idx, 0, n_in - 1)
    return x[..., idx]


class AudioBackbone:
    def hidden_states(self, wav_16k: np.ndarray) -> np.ndarray:
        """(T,) 16 kHz waveform -> (L+1, T50, D) hidden stack."""
        raise NotImplementedError


class JaxAudioBackbone(AudioBackbone):
    def __init__(self, model, params):
        import jax

        self.model = model
        self.params = params

        from ..ops.mel import log_mel_features

        def fn(params, wav):
            feats = log_mel_features(wav)[None]  # (1, T50, 160)
            return self.model.apply({"params": params}, feats)

        self._fn = jax.jit(fn)  # params passed as argument, not constant

        import functools

        @functools.partial(jax.jit, static_argnames=("n_out",))
        def fn_2hz(params, wav, n_out):
            # nearest-resample ON DEVICE: only the (L+1, D, n_out) pooled
            # stack crosses the wire, not the full 50 Hz hidden stack
            import jax.numpy as jnp

            states = fn(params, wav)[:, 0]  # (L+1, T50, D)
            t50 = states.shape[1]
            idx = jnp.clip(
                jnp.floor(jnp.arange(n_out) * (t50 / n_out)).astype(jnp.int32),
                0,
                t50 - 1,
            )
            out = jnp.take(states, idx, axis=1)  # (L+1, n_out, D)
            return jnp.swapaxes(out, 1, 2)  # (L+1, D, n_out)

        self._fn_2hz = fn_2hz

        @functools.partial(jax.jit, static_argnames=("n_out_max",))
        def fn_bucketed(params, wav, n_valid, n_out, n_out_max):
            # one compile per bucket width: n_valid (true samples) and
            # n_out (true 2 Hz steps) are dynamic scalars
            import jax.numpy as jnp

            from ..ops.mel import log_mel_features_masked

            feats, t_valid = log_mel_features_masked(wav, n_valid)
            mask = (jnp.arange(feats.shape[0]) < t_valid)[None]
            states = self.model.apply(
                {"params": params}, feats[None], attention_mask=mask
            )[:, 0]  # (L+1, T50pad, D)
            t_f = t_valid.astype(jnp.float32)
            n_f = jnp.maximum(n_out.astype(jnp.float32), 1.0)
            idx = jnp.floor(jnp.arange(n_out_max) * (t_f / n_f)).astype(jnp.int32)
            idx = jnp.clip(idx, 0, jnp.maximum(t_valid - 1, 0))
            out = jnp.take(states, idx, axis=1)  # (L+1, n_out_max, D)
            return jnp.swapaxes(out, 1, 2)  # (L+1, D, n_out_max)

        self._fn_bucketed = fn_bucketed
        #: distinct compiled bucket widths (observability for recompiles)
        self.bucket_shapes: set[tuple[int, int]] = set()

    def hidden_states(self, wav_16k: np.ndarray) -> np.ndarray:
        out = self._fn(self.params, wav_16k)  # (L+1, 1, T50, D)
        return np.asarray(out)[:, 0]

    def hidden_states_2hz(self, wav_16k, n_out: int) -> np.ndarray:
        """(L+1, D, n_out) hidden stack resampled to the output grid.
        Accepts a NumPy or device array."""
        return np.asarray(self._fn_2hz(self.params, wav_16k, n_out=n_out))

    def hidden_states_2hz_bucketed(
        self, wav_16k, n_out: int, bucket_samples: int
    ) -> np.ndarray:
        """Bucketed variant: the wav is zero-padded to ``bucket_samples`` so
        arbitrary chunk durations hit a bounded set of compiled shapes; mel
        normalization and conformer attention mask out the padding.
        Accepts a NumPy or device array; the pad is a single async-
        dispatched device op, so a resampled wav never crosses back to
        the host."""
        import jax.numpy as jnp

        n = len(wav_16k)
        if bucket_samples < n:
            raise ValueError(f"bucket {bucket_samples} smaller than wav {n}")
        padded = jnp.pad(jnp.asarray(wav_16k), (0, bucket_samples - n))
        n_out_max = max(n_out, int(bucket_samples / TARGET_SR * OUTPUT_HZ))
        self.bucket_shapes.add((bucket_samples, n_out_max))
        out = self._fn_bucketed(
            self.params,
            padded,
            np.int32(n),
            np.int32(n_out),
            n_out_max=n_out_max,
        )
        return np.asarray(out)[..., :n_out]


class TinyAudioBackbone(JaxAudioBackbone):
    """Small random-weight conformer for offline/synthetic runs."""

    def __init__(self, hidden_size: int = 64, num_layers: int = 2, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from ..models.backbones.wav2vec_bert import (
            Wav2VecBertBackbone,
            Wav2VecBertConfig,
        )

        cfg = Wav2VecBertConfig(
            hidden_size=hidden_size,
            num_layers=num_layers,
            num_heads=4,
            intermediate_size=hidden_size * 2,
            conv_kernel_size=7,
            dtype=jnp.float32,
        )
        model = Wav2VecBertBackbone(cfg)
        params = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 16, cfg.input_dim)))["params"]
        )(jax.random.PRNGKey(seed))
        super().__init__(model, params)


def load_hf_audio_backbone(model_name: str) -> JaxAudioBackbone:
    import jax.numpy as jnp
    from transformers import Wav2Vec2BertModel

    from ..models.backbones.wav2vec_bert import (
        Wav2VecBertBackbone,
        Wav2VecBertConfig,
        params_from_hf,
    )

    hf_model = Wav2Vec2BertModel.from_pretrained(model_name)
    c = hf_model.config
    cfg = Wav2VecBertConfig(
        input_dim=c.feature_projection_input_dim,
        hidden_size=c.hidden_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        conv_kernel_size=c.conv_depthwise_kernel_size,
        left_max_pos=c.left_max_position_embeddings,
        right_max_pos=c.right_max_position_embeddings,
        dtype=jnp.bfloat16,
    )
    params = params_from_hf(hf_model.state_dict(), cfg)
    return JaxAudioBackbone(Wav2VecBertBackbone(cfg), params)


class Wav2VecBert(LayeredFeatureBase):
    name: tp.Literal["Wav2VecBert"] = "Wav2VecBert"
    model_name: str = "facebook/w2v-bert-2.0"
    #: wav lengths are padded up to multiples of this (seconds) so arbitrary
    #: ChunkEvents durations hit a bounded set of compiled shapes; 0 disables
    bucket_seconds: float = 5.0

    event_type: tp.ClassVar[str] = "Sound"
    frequency: tp.ClassVar[float] = OUTPUT_HZ

    _backbone: AudioBackbone | None = pydantic.PrivateAttr(default=None)

    def _exclude_from_cache_uid(self) -> list[str]:
        # bucket padding is masked out of the numerics (values match the
        # exact-length call within float tolerance), so it never busts caches
        return ["device", "layers", "layer_aggregation", "bucket_seconds"]

    @staticmethod
    def item_uid(event: Event) -> str:
        return f"{event.filepath}_{event.offset:.2f}_{event.duration:.2f}"  # type: ignore[attr-defined]

    def set_backbone(self, backbone: AudioBackbone) -> None:
        self._backbone = backbone
        self._backbone_owned = False

    @property
    def backbone(self) -> AudioBackbone:
        if self._backbone is None:
            self._backbone_owned = True
            if self.model_name == "tiny-random":
                self._backbone = TinyAudioBackbone()
            else:
                try:
                    self._backbone = load_hf_audio_backbone(self.model_name)
                except Exception as e:
                    # never substitute random weights for a named model:
                    # features are cached under this config's uid, so a
                    # silent fallback would poison the cache for every
                    # later (healthy) run.  Use model_name="tiny-random"
                    # explicitly for offline/synthetic pipelines.
                    raise RuntimeError(
                        f"Could not load audio backbone {self.model_name!r}; "
                        "refusing to substitute random weights under the same "
                        "cache identity (use model_name='tiny-random' for "
                        "offline runs)"
                    ) from e
        return self._backbone

    def _read_mono_zscore(self, event: Event) -> tuple[np.ndarray, float]:
        """Fused native decode+downmix+zscore when the payload is a wav file."""
        from ..core.timed import Frequency as Freq
        from ..io import wav as wavio

        if isinstance(event, Sound):
            sr = Freq(event.frequency)
            wav = wavio.read_mono_zscore(
                str(event.filepath),
                start=sr.to_ind(event.offset),
                frames=sr.to_ind(event.duration),
            )
            return wav, float(event.frequency)
        wav, sfreq = self._read_wav(event)
        wav = wav.mean(axis=1)
        return (wav - wav.mean()) / (1e-8 + wav.std()), sfreq

    def _read_wav(self, event: Event) -> tuple[np.ndarray, float]:
        if isinstance(event, Sound):
            return np.asarray(event.read(), dtype=np.float32), float(event.frequency)
        if isinstance(event, Video):
            # audio demuxed next to the video by ExtractAudioFromVideo
            from pathlib import Path

            from ..io import wav as wavio

            wav_path = Path(str(event.filepath)).with_suffix(".wav")
            sr = wavio.info(str(wav_path)).samplerate
            data = wavio.read(
                str(wav_path),
                start=int(event.offset * sr),
                frames=int(event.duration * sr),
            )
            return data, float(sr)
        raise TypeError(f"Unsupported event for audio feature: {type(event)}")

    def _compute(self, events: tp.Sequence[Event]) -> tp.Iterator[np.ndarray]:
        import jax.numpy as jnp

        from ..ops.resample import resample_poly

        backbone = self.backbone
        for event in events:
            wav, sfreq = self._read_mono_zscore(event)
            if int(sfreq) != TARGET_SR:
                # stays on device: the backbone consumes it directly, so the
                # resampled wav never makes the (slow) D2H->H2D round trip
                wav = resample_poly(jnp.asarray(wav), int(sfreq), TARGET_SR)
            timepoints = max(1, Frequency(OUTPUT_HZ).to_ind(event.duration))
            bucket = 0
            if self.bucket_seconds and hasattr(backbone, "hidden_states_2hz_bucketed"):
                step = int(self.bucket_seconds * TARGET_SR)
                bucket = max(step, -(-len(wav) // step) * step)
            if bucket:
                latents = backbone.hidden_states_2hz_bucketed(wav, timepoints, bucket)
            elif hasattr(backbone, "hidden_states_2hz"):
                latents = backbone.hidden_states_2hz(wav, timepoints)
            else:
                states = backbone.hidden_states(wav)  # (L+1, T50, D)
                latents = np.transpose(states, (0, 2, 1))  # (L+1, D, T50)
                if timepoints != latents.shape[-1]:
                    latents = nearest_resample(latents, timepoints)
            yield latents.astype(np.float32)

    def _get_timed_arrays(
        self, events: list[Event], start: float, duration: float
    ) -> tp.Iterable[TimedArray]:
        for latent, event in zip(self._get_data(events), events):
            tdata = TimedArray(
                data=np.asarray(latent), start=event.start, frequency=OUTPUT_HZ
            )
            sub = tdata.overlap(start=start, duration=duration)
            if sub is None:
                sub = tdata.overlap(start=tdata.start, duration=0)
            sub.data = self._aggregate_layers(sub.data)
            yield sub
