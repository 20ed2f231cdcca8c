"""Polyphase windowed-sinc resampling on device (julius replacement).

The reference resamples 44.1/48 kHz audio to 16 kHz through julius's
pure-torch polyphase FIR (reference features/audio.py:129-138).  Here the
kernel bank is built once on host (NumPy) and the filtering runs as a
single strided conv on the MXU under jit — one fused op instead of a
Python DSP stack, and differentiable for free.

Filter design matches the classic polyphase construction: gcd-reduced
rates p (new) / q (old), windowed sinc with ``zeros`` crossings and a
raised-cosine window, rolloff 0.945.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_poly", "resample_kernel"]


@functools.lru_cache(maxsize=16)
def resample_kernel(
    old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel bank.

    Returns (kernels (p, 1, width), p, q, pad) where output phase i is the
    convolution of the input (stride q) with kernels[i].
    """
    g = math.gcd(int(old_sr), int(new_sr))
    q = int(old_sr) // g  # decimation
    p = int(new_sr) // g  # interpolation (number of phases)
    sr = min(p, q) * rolloff
    width = int(math.ceil(zeros * q / sr))
    idx = np.arange(-width, width + q, dtype=np.float64)
    kernels = []
    for i in range(p):
        t = (-i / p + idx / q) * sr
        t = np.clip(t, -zeros, zeros) * math.pi
        window = np.cos(t / zeros / 2) ** 2
        kernel = np.sinc(t / math.pi) * window
        kernels.append(kernel)
    scale = sr / q
    bank = (np.stack(kernels) * scale).astype(np.float32)[:, None, :]
    return bank, p, q, width


def resample_poly(x: jax.Array, old_sr: int, new_sr: int) -> jax.Array:
    """Resample the last axis of x from old_sr to new_sr.

    x: (..., T) float32.  Output length is round(T * new_sr / old_sr).
    Jittable; the conv runs on the MXU with the phase bank as the output
    channel dimension.
    """
    if old_sr == new_sr:
        return x
    bank, p, q, width = resample_kernel(int(old_sr), int(new_sr))
    length = x.shape[-1]
    out_len = int(length * new_sr / old_sr)

    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, length))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + q)))
    # (N, 1, T) * (p, 1, K) -> (N, p, frames), stride q
    out = jax.lax.conv_general_dilated(
        xf,
        jnp.asarray(bank),
        window_strides=(q,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # interleave phases: frame f phase i -> output index f*p + i
    out = jnp.swapaxes(out, 1, 2).reshape(xf.shape[0], -1)
    out = out[:, :out_len]
    return out.reshape(lead + (out_len,))
