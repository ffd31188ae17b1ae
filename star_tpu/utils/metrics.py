"""Fidelity metrics (PSNR / SSIM) in JAX — the acceptance gauges for weight
parity against reference outputs (BASELINE.md: PSNR/SSIM match on the toy
clip). The reference repo itself ships no metric code; paper numbers use
standard implementations, which these follow (SSIM: Wang et al. 2004,
11x11 gaussian window, K1=0.01, K2=0.03).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Mean PSNR over leading dims; a/b: [..., H, W, C]."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    mse = jnp.mean((a32 - b32) ** 2, axis=(-3, -2, -1))
    return jnp.mean(10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def _filter(x: jax.Array, k2d: jax.Array) -> jax.Array:
    c = x.shape[-1]
    k = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)


def ssim(a: jax.Array, b: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Mean SSIM; a/b: [N, H, W, C] (frames as batch)."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    k = jnp.asarray(_gaussian_window())
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter(a32, k)
    mu_b = _filter(b32, k)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter(a32 * a32, k) - mu_aa
    s_bb = _filter(b32 * b32, k) - mu_bb
    s_ab = _filter(a32 * b32, k) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)
