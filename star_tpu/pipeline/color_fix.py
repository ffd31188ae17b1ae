"""AdaIN / wavelet color correction, fused on-device.

Behavioral reference: /root/reference/video_super_resolution/color_fix.py.
The reference loops frames on host; here both fixes are batched over frames
in one XLA call (vmapped math, replicate-pad depthwise blur for the wavelet
pyramid).

Conventions (matching the reference's callers):
  target  — generated frames, [F, H, W, 3], 0..255 range
  source  — input LQ frames upsampled to the same size, [F, H, W, 3], [-1, 1]
  returns — corrected frames, [F, H, W, 3], 0..255
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mean_std(x: jax.Array, eps: float = 1e-5):
    # x: [F, H, W, C] -> per (frame, channel) stats over H*W
    f, h, w, c = x.shape
    flat = x.reshape(f, h * w, c)
    mean = flat.mean(axis=1)
    var = flat.var(axis=1, ddof=1) + eps
    return mean[:, None, None, :], jnp.sqrt(var)[:, None, None, :]


def adaptive_instance_normalization(content: jax.Array,
                                    style: jax.Array) -> jax.Array:
    """Match per-frame, per-channel mean/std of content to style
    (color_fix.py:62-74; torch .var() default is ddof=1)."""
    style_mean, style_std = _mean_std(style)
    content_mean, content_std = _mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean


def adain_color_fix(target: jax.Array, source: jax.Array) -> jax.Array:
    """target uint8-range [F,H,W,3]; source [-1,1] [F,H,W,3] (color_fix.py:15-29)."""
    t = target.astype(jnp.float32) / 255.0
    s = (source.astype(jnp.float32) + 1.0) / 2.0
    out = adaptive_instance_normalization(t, s)
    return jnp.clip(out, 0.0, 1.0) * 255.0


def wavelet_blur(image: jax.Array, radius: int) -> jax.Array:
    """Depthwise 3x3 'wavelet' blur with dilation=radius, replicate padding
    (color_fix.py:76-95). image: [F, H, W, 3]."""
    kernel = jnp.array([[0.0625, 0.125, 0.0625],
                        [0.125, 0.25, 0.125],
                        [0.0625, 0.125, 0.0625]], jnp.float32)
    c = image.shape[-1]
    # depthwise: kernel [3,3,1,C] with feature_group_count=C
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    x = jnp.pad(image, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                mode='edge')
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding='VALID',
        rhs_dilation=(radius, radius),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)


def wavelet_decomposition(image: jax.Array, levels: int = 5):
    high_freq = jnp.zeros_like(image)
    for i in range(levels):
        radius = 2 ** i
        low_freq = wavelet_blur(image, radius)
        high_freq = high_freq + (image - low_freq)
        image = low_freq
    return high_freq, low_freq


def wavelet_reconstruction(content: jax.Array, style: jax.Array) -> jax.Array:
    content_high, _ = wavelet_decomposition(content)
    _, style_low = wavelet_decomposition(style)
    return content_high + style_low


def wavelet_color_fix(target: jax.Array, source: jax.Array) -> jax.Array:
    t = target.astype(jnp.float32) / 255.0
    s = (source.astype(jnp.float32) + 1.0) / 2.0
    out = wavelet_reconstruction(t, s)
    return jnp.clip(out, 0.0, 1.0) * 255.0
