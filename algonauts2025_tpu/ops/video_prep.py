"""Video preprocessing on device: resize, center-crop, normalize.

Replaces the HF VJEPA2VideoProcessor host loop (reference
features/video.py:252-264 runs it per window on CPU): here the whole
uint8 (T, H, W, 3) window is shipped to the device once and the
bilinear resize + crop + rescale + normalize run fused under jit, so
preprocessing overlaps backbone compute instead of blocking the host.

Parity targets (HF VJEPA2VideoProcessor = torchvision v2 resize):
shortest edge -> int(crop*256/224), long edge TRUNCATED
(int(resize * long / short), torchvision _compute_resized_output_size),
ANTIALIASED bilinear (torchvision passes antialias=True), center crop,
1/255 rescale, ImageNet mean/std.  torchvision itself is absent from this
environment, so the semantics are replicated from its source rather than
pinned by a direct A/B test — documented divergence risk is the resize
filter's tail weights (jax.image antialias vs torchvision's), bounded
well below the int8-path noise floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["preprocess_frames"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.partial(jax.jit, static_argnames=("crop_size",))
def preprocess_frames(frames: jax.Array, crop_size: int = 256) -> jax.Array:
    """(T, H, W, 3) uint8 -> (T, crop, crop, 3) float32 normalized."""
    t, h, w, c = frames.shape
    resize_size = int(crop_size * 256 / 224)
    # torchvision shortest-edge semantics: short -> resize_size exactly,
    # long -> int(resize_size * long / short) (truncated, not rounded)
    if h <= w:
        new_h, new_w = resize_size, int(resize_size * w / h)
    else:
        new_h, new_w = int(resize_size * h / w), resize_size
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, (t, new_h, new_w, c), method="bilinear", antialias=True)
    # torchvision center_crop: int(round(diff / 2.0)) — Python banker's
    # rounding, so an odd diff rounds its .5 to the EVEN offset (391->68,
    # 389->66); floor division is one pixel off for half the odd diffs
    top = int(round((new_h - crop_size) / 2.0))
    left = int(round((new_w - crop_size) / 2.0))
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (t, crop_size, crop_size, c)
    )
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std
