"""Normalization primitives (channels-last, fp32 statistics).

The reference uses nn.GroupNorm(32, C) everywhere in the UNet (eps 1e-5 in
ResBlocks, 1e-6 in the spatial/temporal transformers' input norms) and
nn.LayerNorm inside transformer blocks. TPU note: statistics accumulate in
float32 even under bf16 compute — GN/LN are the classic bf16 PSNR killers
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the last (channel) axis; leading axes are batch/spatial.

    x: [..., C]; scale/bias: [C].
    """
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    orig_shape = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # [B, spatial..., G, C//G] -> normalize over (spatial..., C//G) per group
    xg = x32.reshape(orig_shape[0], -1, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x32 = xg.reshape(orig_shape)
    return (x32 * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)
