"""Resize / padding helpers (channels-last).

Semantics match torch.nn.functional.interpolate with align_corners=False
(half-pixel centers) — which is what jax.image.resize implements — since the
pipeline's 4x pre-upsample (video_to_video_model.py:81) feeds the VAE and any
mismatch shows up directly in PSNR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """x: [..., H, W, C] -> [..., out_h, out_w, C]."""
    out_shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, out_shape, method='bilinear').astype(x.dtype)


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    out_shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, out_shape, method='nearest').astype(x.dtype)


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Exact 2x nearest upsample via repeat (cheaper than gather-based resize).

    x: [..., H, W, C] -> [..., 2H, 2W, C].
    """
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def pad_to_fit(h: int, w: int,
               grid: tuple[int, int] = (720, 1280)) -> tuple[int, int, int, int]:
    """Host-side: padding (w1, w2, h1, h2) onto the 720x1280-or-64-multiple
    grid the UNet was trained on (video_to_video_model.py:164-187)."""
    best_h, best_w = grid

    def _center(sz, best):
        a = (best - sz) // 2
        return a, best - a - sz

    if h < best_h:
        h1, h2 = _center(h, best_h)
    elif h == best_h:
        h1 = h2 = 0
    else:
        h1 = 0
        h2 = int((h + 48) // 64 * 64) + 64 - 48 - h
    if w < best_w:
        w1, w2 = _center(w, best_w)
    elif w == best_w:
        w1 = w2 = 0
    else:
        w1 = 0
        w2 = int(w // 64 * 64) + 64 - w
    return (w1, w2, h1, h2)


def adjust_resolution(h: int, w: int, up_scale: int) -> tuple[int, int]:
    """Target output resolution given the 720p floor / 1280*2048 area ceiling
    (inference_utils.py:42-54)."""
    import numpy as np
    if h * up_scale < 720:
        up_s = 720 / h
        return int(up_s * h // 2 * 2), int(up_s * w // 2 * 2)
    if h * w * up_scale * up_scale > 1280 * 2048:
        up_s = float(np.sqrt(1280 * 2048 / (h * w)))
        return int(up_s * h // 2 * 2), int(up_s * w // 2 * 2)
    return int(up_scale * h // 2 * 2), int(up_scale * w // 2 * 2)
