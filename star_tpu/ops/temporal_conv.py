"""3-tap temporal convolution as an im2col matmul (shared by the video UNet
and the SVD temporal VAE).

XLA's native lowering of a (3,1) conv over [B, F, HW, C] picks a
split-spatial layout that runs at ~28 TF/s on v5e and forces upstream fp32
GroupNorm coefficient broadcasts to materialize + relayout (measured in the
r2c bench trace). Lane-concatenating the three frame-shifted views and
running ONE [B*F*N, 3C] x [3C, Cout] gemm keeps the activation in its
[.., C]-minor layout and sustains ~140 TF/s; XLA recognizes the im2col and
emits a 1x1 convolution.

`TemporalConv3` keeps nn.Conv((3,1))'s parameter tree ('kernel'
[3,1,Cin,Cout] + 'bias'), so converters/checkpoints are interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def temporal_conv3(x: jax.Array, kernel: jax.Array,
                   bias: jax.Array) -> jax.Array:
    """x [B, F, N, Cin], kernel [3, 1, Cin, Cout] (fp32 param), bias [Cout]
    -> [B, F, N, Cout] in x.dtype; taps accumulate in fp32 (nn.Conv
    semantics), SAME padding over F.

    Spelling picked by activation size (both measured on chip, r2):
    - UNet latent scales (N~14k): im2col gemm. XLA's native conv lowering
      ran at ~28 TF/s there and materialized fp32 GN broadcasts; the gemm
      runs ~140 TF/s (decode step 1265 -> 1235 era measurements).
    - VAE pixel scales (N up to 720*1280): the native (3,1) conv. The
      im2col concat materializes 3x GB-scale activations (decode 1.57 ->
      1.83 s) and three shifted gemms relayout the f32 accumulators between
      the spatial-conv and flat-temporal layouts (1.98 s)."""
    b, f, n, cin = x.shape
    cout = kernel.shape[-1]
    if b * f * n * cin <= 128 * (1 << 20):   # UNet latent scales sit below
        kb = kernel[:, 0].reshape(3 * cin, cout).astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        xs = jnp.concatenate([xp[:, tap:tap + f] for tap in range(3)],
                             axis=-1)
        y = jnp.einsum('bfnc,cd->bfnd', xs, kb,
                       preferred_element_type=jnp.float32)
    else:
        from .conv_acc import conv_f32acc
        y = conv_f32acc(x, kernel.astype(x.dtype), (1, 1), ((1, 1), (0, 0)),
                        ('NHWC', 'HWIO', 'NHWC'))
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def temporal_conv3_video(x5: jax.Array, kernel: jax.Array,
                         bias: jax.Array) -> jax.Array:
    """5-D variant: x5 [B, F, H, W, C] through a real (3,1,1) conv — keeps
    the VAE's temporal blocks in the SAME layout as the surrounding spatial
    convs, so XLA never relayouts between a flat [B,F,HW,C] stream and the
    NHWC stream."""
    k5 = kernel.reshape(3, 1, 1, kernel.shape[2], kernel.shape[3]) \
        .astype(x5.dtype)
    # output in the input dtype: the MXU accumulates bf16 convs in fp32
    # internally either way, but preferred_element_type=f32 made XLA
    # MATERIALIZE the fp32 conv output — 1 GB-scale f32[B,F,H,W,C] temps at
    # the VAE's pixel scales, ~180 ms of the r4 720p decode trace (the
    # bias-add+cast fusion did not fuse into the 3-D conv). Rounding moves
    # from after the bias add to before it (one bf16 ulp); gated by the
    # svd_vae golden (fp32) + test_bf16_gate.
    y = jax.lax.conv_general_dilated(
        x5, k5, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return y + bias.astype(x5.dtype)


class TemporalConv3(nn.Module):
    """Flax wrapper with nn.Conv((3,1))'s param tree; accepts [B, F, N, C]
    (gemm/conv spellings by size) or [B, F, H, W, C] (layout-preserving
    (3,1,1) conv)."""
    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param('kernel', init, (3, 1, cin, self.features),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if x.ndim == 5:
            return temporal_conv3_video(x.astype(self.dtype), kernel, bias)
        return temporal_conv3(x.astype(self.dtype), kernel, bias)
