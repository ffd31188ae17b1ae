"""Training losses: v-prediction MSE + timestep-aware Fourier frequency loss.

Behavioral reference: train_sr.py:566-704 (fourier_transform,
extract_frequencies, the loss combination) and loss.py:126-193 on the
CogVideoX side (same construction).

Reference quirks preserved (documented):
  * the cutoff is the 80th percentile of the rfft2 magnitude, approximated on
    a 10k subsample for large tensors — here: exact quantile when the tensor
    is small, deterministic strided subsample otherwise (vs the reference's
    torch.randint sample; distributional parity, not bitwise).
  * the reference decodes pred-x0 through the VAE under no_grad
    (train_sr.py:686-687), so the frequency loss carries NO gradient — it is
    effectively a logged metric. `freq_grad=False` (default) reproduces that;
    True makes it a real training signal (improvement over reference).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def fourier_split(x: jax.Array, subsample: int = 10000):
    """Per-frame rfft2 split into low/high frequency (train_sr.py:566-614).

    x: [N, H, W, C] pixel frames (any layout with trailing spatial dims works
    since the fft is over H, W). Returns (low, high) with real/imag stacked
    on a trailing axis.
    """
    x32 = x.astype(jnp.float32)
    fft = jnp.fft.rfft2(x32, axes=(-3, -2))
    magnitude = jnp.abs(fft)
    flat = magnitude.reshape(-1)
    n = flat.shape[0]
    if n > subsample:
        # deterministic strided subsample (reference uses randint sampling)
        stride = n // subsample
        flat = flat[::stride][:subsample]
    cutoff = jnp.quantile(flat, 0.8)
    sharpness = 10.0
    low_mask = jax.nn.sigmoid(sharpness * (cutoff - magnitude))
    low = fft * low_mask
    high = fft * (1.0 - low_mask)
    stack = lambda z: jnp.stack([z.real, z.imag], axis=-1)
    return stack(low), stack(high)


def star_sr_loss(v_pred: jax.Array, v_target: jax.Array, t: jax.Array,
                 pred_x0_pixels: Optional[jax.Array] = None,
                 gt_pixels: Optional[jax.Array] = None,
                 freq_weight: float = 0.01, alpha: float = 2.0,
                 beta: float = 1.0, freq_grad: bool = False):
    """loss = MSE(v) + beta * (1 - t/999) * 0.01*(ct*L1(low) + (1-ct)*L1(high)),
    ct = (t/999)^alpha  (train_sr.py:692-704).

    Returns (scalar loss, metrics dict). t: [B]. pixels are [B,F,H,W,3] in
    [-1,1]; if either pixels arg is None the frequency term is skipped.
    """
    loss_v = jnp.mean((v_pred.astype(jnp.float32)
                       - v_target.astype(jnp.float32)) ** 2)
    metrics = {'loss_v': loss_v}
    loss = loss_v
    if pred_x0_pixels is not None and gt_pixels is not None:
        if not freq_grad:
            pred_x0_pixels = jax.lax.stop_gradient(pred_x0_pixels)
        b = pred_x0_pixels.shape[0]
        pf = pred_x0_pixels.reshape((-1,) + pred_x0_pixels.shape[-3:])
        gf = gt_pixels.reshape((-1,) + gt_pixels.shape[-3:])
        low_p, high_p = fourier_split(pf)
        low_g, high_g = fourier_split(gf)
        loss_low = jnp.mean(jnp.abs(low_p - low_g))
        loss_high = jnp.mean(jnp.abs(high_p - high_g))
        tn = t.astype(jnp.float32) / 999.0
        ct = jnp.mean(tn ** alpha)
        weight_t = jnp.mean(1.0 - tn)
        loss_t = freq_weight * (ct * loss_low + (1.0 - ct) * loss_high)
        loss = loss_v + beta * weight_t * loss_t
        metrics.update({'loss_low': loss_low, 'loss_high': loss_high,
                        'loss_t': loss_t})
    metrics['total_loss'] = loss
    return loss, metrics
