"""Building blocks of the I2VGen-XL-style video UNet, TPU-first.

Behavioral reference: /root/reference/video_to_video/modules/unet_v2v.py
(ResBlock:570, TemporalConvBlock_v2:1194, SpatialTransformer:242,
TemporalTransformer:970, BasicTransformerBlock:414, LIEM SpatialAttention:380 /
TemporalLocalAttention:396, GEGLU:496, Up/Downsample:532/695).

Design deltas from the reference (torch NCHW + xformers):
  * channels-last everywhere — spatial stream is [B*F, H, W, C], temporal
    stream [B*HW, F, C]; convs lower to XLA NHWC convolutions that tile onto
    the MXU directly.
  * attention goes through ops.attention (XLA einsum or Pallas flash kernel),
    always with fp32 softmax.
  * GroupNorm/LayerNorm statistics in fp32 (ops.norms) under bf16 compute.
  * no module-level chunking hacks (max_bs=16384 etc.) — blocking is the
    kernel's job.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.attention import dot_product_attention
from ...ops.norms import group_norm, layer_norm
from ...ops.temporal_attention import temporal_attention
from ...ops.temporal_conv import TemporalConv3
from ...ops.upsample_conv import UpsampleConv2x


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """[B] -> [B, dim]; cos-first layout (unet_v2v.py:96-108)."""
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 != 0:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm(nn.Module):
    """Channels-last GroupNorm with fp32 stats; reduces over every non-batch
    dim (torch semantics: 4D spatial GN when x=[BF,H,W,C], 5D video GN when
    x=[B,F,H,W,C])."""
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.eps)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, scale, bias, self.eps)


class Attention(nn.Module):
    """Multi-head (cross-)attention: q from x, k/v from context (or x)."""
    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 context: Optional[jax.Array] = None) -> jax.Array:
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name)
        q = dense(inner, 'to_q', False)(x)
        k = dense(inner, 'to_k', False)(context)
        v = dense(inner, 'to_v', False)(context)
        # natural-layout entry: picks the packed flash kernel on TPU for
        # long self-attention with even head counts (no head transpose),
        # the unpacked flash for odd head counts, XLA for short/cross attn
        from ...ops.attention import dot_product_attention_packed
        out = dot_product_attention_packed(q, k, v, self.num_heads)
        return dense(self.out_dim, 'to_out', True)(out)


class FeedForwardGEGLU(nn.Module):
    """GEGLU MLP, mult=4 (unet_v2v.py:496-529)."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name='proj')(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * jax.nn.gelu(gate.astype(jnp.float32)).astype(h.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name='out')(h)


class SpatialLIEM(nn.Module):
    """Local Information Enhancement Module, spatial flavor: channel max/mean
    -> 7x7 conv -> sigmoid gate (unet_v2v.py:380-394).

    With return_gate=True, returns the per-pixel fp32 sigmoid gate
    [BF, H, W, 1] instead of the gated tensor — for callers that fold the
    gate into a downstream LayerNorm (ops/norms.gated_layer_norm) without
    materializing g*x."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_gate: bool = False) -> jax.Array:
        # x: [BF, H, W, C]
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        w = jnp.concatenate([mx, mn], axis=-1)
        w = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype,
                    name='conv')(w)
        g = jax.nn.sigmoid(w.astype(jnp.float32))
        if return_gate:
            return g
        return g.astype(x.dtype) * x


class TemporalLIEM(nn.Module):
    """LIEM, temporal flavor: channel max/mean -> Dense(2->1) -> sigmoid gate
    (unet_v2v.py:396-411).

    With return_kernel=True, returns the Dense's [2] weight vector instead of
    gating (the eye-probe keeps the param path local*/proj/kernel identical
    for the converter) — for callers that fuse the gate elsewhere, e.g. the
    unrouted tools/negative_results/fused_ln.py kernel."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 return_kernel: bool = False) -> jax.Array:
        dense = nn.Dense(1, use_bias=False, dtype=self.dtype, name='proj')
        if return_kernel:
            return dense(jnp.eye(2, dtype=self.dtype))[:, 0]
        # x: [BHW, F, C]
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        w = dense(jnp.concatenate([mx, mn], axis=-1))
        return jax.nn.sigmoid(w.astype(jnp.float32)).astype(x.dtype) * x


class SpatialTransformerBlock(nn.Module):
    """BasicTransformerBlock, 'space' type with LIEM (unet_v2v.py:464-477):
    gate -> self-attn -> text cross-attn -> GEGLU FF, residuals add to the
    ungated stream."""
    dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array, h: int,
                 w: int, cfg_split: bool = False) -> jax.Array:
        # x: [BF, HW, C]; context: [BF, L, Cc].
        # cfg_split: x carries ONE copy of a CFG pair (context carries both);
        # the streams are identical until this cross-attention, so the gate/
        # self-attn prefix runs at half batch and is tiled here (the
        # reference runs the full pair end to end, diffusion_sdedit.py:44-115)
        from ...ops.norms import gated_layer_norm
        bf = x.shape[0]
        # the per-pixel LIEM gate folds into norm1's coefficients
        # (ops/norms.gated_layer_norm) — g*x is never materialized
        g = SpatialLIEM(dtype=self.dtype, name='local1')(
            x.reshape(bf, h, w, self.dim), return_gate=True)
        norm1 = _GNParams(self.dim, name='norm1')()
        x = Attention(self.num_heads, self.head_dim, self.dim,
                      dtype=self.dtype, name='attn1')(
                          gated_layer_norm(x, *norm1,
                                           g.reshape(bf, h * w, 1))) + x
        if cfg_split:
            x = jnp.concatenate([x, x], axis=0)
        x = Attention(self.num_heads, self.head_dim, self.dim,
                      dtype=self.dtype, name='attn2')(
                          LayerNorm(name='norm2')(x), context) + x
        x = FeedForwardGEGLU(self.dim, dtype=self.dtype, name='ff')(
            LayerNorm(name='norm3')(x)) + x
        return x


class TemporalTransformerBlock(nn.Module):
    """BasicTransformerBlock, 'temp' type with two LIEM gates
    (unet_v2v.py:479-491); both attentions are temporal self-attention.

    Layout: [B, F, N, C] (frame attention computed in place; LIEM/LN/FF are
    per-token so layout-agnostic)."""
    dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, F, N, C]
        # The LIEM gate + LN pair runs as liem_layer_norm (ops/norms.py):
        # the per-token gate folds algebraically into the LN coefficients so
        # the gated tensor is never materialized and the max/mean/meansq
        # reductions fuse into one XLA pass. Pallas spellings of this site
        # (tools/negative_results/fused_ln.py r3, tools/negative_results/stream_fuse.py r4) both measured SLOWER
        # than the XLA chain at every UNet scale — see their docstrings.
        from ...ops.norms import liem_layer_norm
        gw1 = TemporalLIEM(dtype=self.dtype, name='local1')(
            x, return_kernel=True)
        norm1 = _GNParams(self.dim, name='norm1')()
        x = TemporalAttentionInplace(self.num_heads, self.head_dim, self.dim,
                                     dtype=self.dtype, name='attn1')(
                                         liem_layer_norm(x, *norm1, gw1)) + x
        gw2 = TemporalLIEM(dtype=self.dtype, name='local2')(
            x, return_kernel=True)
        norm2 = _GNParams(self.dim, name='norm2')()
        x = TemporalAttentionInplace(self.num_heads, self.head_dim, self.dim,
                                     dtype=self.dtype, name='attn2')(
                                         liem_layer_norm(x, *norm2, gw2)) + x
        x = FeedForwardGEGLU(self.dim, dtype=self.dtype, name='ff')(
            LayerNorm(name='norm3')(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """Per-frame transformer over HW tokens with text cross-attention
    (unet_v2v.py:242-317, use_linear=True)."""
    channels: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 cfg_split: bool = False) -> jax.Array:
        # x: [BF, H, W, C]; context: [BF, L, Cc] (or [2BF, ...] if cfg_split)
        bf, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        x_in = x
        x = GroupNorm(eps=1e-6, name='norm')(x)
        x = x.reshape(bf, h * w, c)
        x = nn.Dense(inner, dtype=self.dtype, name='proj_in')(x)
        x = SpatialTransformerBlock(inner, self.num_heads, self.head_dim,
                                    dtype=self.dtype, name='block')(
                                        x, context, h, w, cfg_split)
        x = nn.Dense(c, dtype=self.dtype, name='proj_out',
                     kernel_init=nn.initializers.zeros)(x)
        if cfg_split:
            x_in = jnp.concatenate([x_in, x_in], axis=0)
        return x.reshape(-1, h, w, c) + x_in


class TemporalAttentionInplace(nn.Module):
    """Attention over the frame axis of [B, F, N, C] WITHOUT transposing the
    big activation to [B*N, F, C] (the reference materializes that transpose,
    unet_v2v.py:1045-1056; here the per-pixel frame attention is an einsum
    with hw kept in place — logits are only [B, H, N, F, F]).

    Param names/shapes identical to Attention (to_q/k/v/out) so the converter
    and checkpoints are shared."""
    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, n, c = x.shape
        inner = self.num_heads * self.head_dim
        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name)
        # q/k/v stay in the [B, F, N, H*D] layout the Dense produces; the
        # fused kernel (ops/temporal_attention.py) runs the whole
        # logits/softmax/pv chain with N on the vector lanes. The previous
        # einsum formulation made XLA materialize 5.5 GB/s head-split shuffle
        # copies of every operand plus fp32 [b,n,h,f,g] probability arrays —
        # the largest copy family in the r2b full-step trace.
        q = dense(inner, 'to_q', False)(x)
        k = dense(inner, 'to_k', False)(x)
        v = dense(inner, 'to_v', False)(x)
        out = temporal_attention(q, k, v, self.num_heads)
        return nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype,
                        name='to_out')(out)


class TemporalTransformer(nn.Module):
    """Per-pixel transformer over F tokens (unet_v2v.py:970-1092,
    use_linear=False -> 1x1 conv projections == Dense on channels).

    TPU-first: everything runs in [B, F, HW, C] layout; the frame-axis
    attention is computed in place (TemporalAttentionInplace) instead of the
    reference's (b h w) f c transpose."""
    channels: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, F, H, W, C]
        b, f, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        x_in = x
        x = GroupNorm(eps=1e-6, name='norm')(x)
        x = x.reshape(b, f, h * w, c)
        x = nn.Dense(inner, dtype=self.dtype, name='proj_in')(x)
        x = TemporalTransformerBlock(inner, self.num_heads, self.head_dim,
                                     dtype=self.dtype, name='block')(x)
        x = nn.Dense(c, dtype=self.dtype, name='proj_out',
                     kernel_init=nn.initializers.zeros)(x)
        return x.reshape(b, f, h, w, c) + x_in


class _GNParams(nn.Module):
    """Parameter holder with GroupNorm's tree ('scale'/'bias') for fused
    kernels that apply the norm internally."""
    channels: int

    @nn.compact
    def __call__(self):
        s = self.param('scale', nn.initializers.ones, (self.channels,),
                       jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.channels,),
                       jnp.float32)
        return s, b


class _TConvParams(nn.Module):
    """Parameter holder with TemporalConv3's tree ('kernel' [3,1,Cin,Cout]
    + 'bias')."""
    in_channels: int
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        k = self.param('kernel', init, (3, 1, self.in_channels,
                                        self.features), jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class TemporalConvBlockV2(nn.Module):
    """4x (GN+SiLU+[Dropout]+Conv k=(3,1,1)) residual temporal conv
    (unet_v2v.py:1194-1278). Channels-last: the (3,1,1) Conv3d over
    [B,C,F,H,W] is a 3-tap matmul conv over [B, F, HW, C].

    Inference path (r4): the 4-stage chain runs through the fused
    GN+SiLU+tconv Pallas kernel (ops/fused_temporal_conv.py) with GroupNorm
    statistics THREADED between stages and the residual folded into the
    last stage — one HBM read+write per stage instead of the XLA chain's
    per-stage stats reduce + two materialized frame-shifted im2col copies +
    apply/SiLU glue (~120 ms of the r4 trace of the 1143 ms CFG step).
    Training with active dropout keeps the unfused chain (dropout between
    GN and conv breaks the stats threading). Param tree is unchanged."""
    channels: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from ...ops.fused_temporal_conv import fused_gn_silu_tconv3
        from ...ops.temporal_conv import temporal_conv3
        # x: [B, F, H, W, C]
        b, f, h, w, c = x.shape
        identity = x
        x = x.reshape(b, f, h * w, c)
        names = ('conv1', 'conv2', 'conv3', 'conv4')
        gn = [_GNParams(c, name=f'{n}_norm')() for n in names]
        cv = [_TConvParams(c, self.channels, zero_init=(n == 'conv4'),
                           name=n)() for n in names]

        if deterministic or self.dropout <= 0:
            stats = None
            for i in range(4):
                last = i == 3
                x, stats = fused_gn_silu_tconv3(
                    x.astype(self.dtype), *gn[i], *cv[i], stats=stats,
                    residual=(identity.reshape(b, f, h * w, c) if last
                              else None),
                    want_stats=not last)
            return x.reshape(b, f, h, w, c)

        for i in range(4):
            x = group_norm(x, *gn[i])
            x = jax.nn.silu(x.astype(jnp.float32)).astype(self.dtype)
            if i > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = temporal_conv3(x.astype(self.dtype), *cv[i])
        return identity + x.reshape(b, f, h, w, c)


class ResBlock(nn.Module):
    """GN/SiLU/Conv residual block with timestep-embedding add and a trailing
    temporal conv (unet_v2v.py:570-692; use_scale_shift_norm=False in STAR)."""
    out_channels: int
    dropout: float = 0.1
    use_temporal_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, frames: int,
                 deterministic: bool = True) -> jax.Array:
        # x: [BF, H, W, C]; emb: [BF, E]
        bf, hh, ww, c = x.shape
        h = GroupNorm(name='in_norm')(x)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='in_conv')(h)
        e = jax.nn.silu(emb.astype(jnp.float32)).astype(self.dtype)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name='emb_proj')(e)
        h = h + e[:, None, None, :]
        h = GroupNorm(name='out_norm')(h)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name='out_conv')(h)
        if c == self.out_channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name='skip')(x)
        h = skip + h

        if self.use_temporal_conv:
            b = bf // frames
            h5 = h.reshape(b, frames, hh, ww, self.out_channels)
            h5 = TemporalConvBlockV2(self.out_channels, dropout=0.1,
                                     dtype=self.dtype, name='temporal_conv')(
                                         h5, deterministic=deterministic)
            h = h5.reshape(bf, hh, ww, self.out_channels)
        return h


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric padding (H pad 2, W pad 1
    -> H/2+1 x W/2; unet_v2v.py:695-729)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.channels, (3, 3), strides=2,
                       padding=((2, 2), (1, 1)), dtype=self.dtype,
                       name='conv')(x)


class Upsample(nn.Module):
    """Nearest 2x + crop 1 row top/bottom + 3x3 conv (unet_v2v.py:532-567) —
    the inverse of Downsample's asymmetric padding."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # phase-decomposed nearest-2x + crop + conv (ops/upsample_conv.py):
        # 16 MXU taps per 4 output pixels instead of 36 and no 4x nearest
        # intermediate; params match the nn.Conv spelling
        return UpsampleConv2x(self.channels, dtype=self.dtype, crop_h=True,
                              name='conv')(x)
