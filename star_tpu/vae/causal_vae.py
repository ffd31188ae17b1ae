"""CogVideoX causal 3D VAE, TPU-first.

Behavioral reference: cogvideox-based/sat/vae_modules/cp_enc_dec.py
(ContextParallelCausalConv3d:360, ContextParallelGroupNorm:433,
SpatialNorm3D:451, Up/DownSample3D:531/571, ContextParallelResnetBlock3D:614,
ContextParallelEncoder3D:716, ContextParallelDecoder3D:839) and
vae_modules/autoencoder.py (VideoAutoencoderInferenceWrapper).

Key semantics preserved:
  * causal time conv: k-1 front padding, replicate-first-frame at the clip
    start, or the carried cache of the previous chunk — the reference ships
    this cache through CPU (cp_enc_dec.py:402-423); here it is a flax 'cache'
    variable collection threaded functionally between chunked decode calls.
  * first-frame-aware temporal down/upsampling (odd t keeps frame 0
    uncompressed): 25 input frames <-> 7 latent frames at 4x time compression.
  * encoder GroupNorm gathers over the full clip (gather_norm=True);
    decoder norms are SpatialNorm3D (zq-modulated GN) with per-call stats —
    chunked decode therefore has per-chunk statistics, faithfully reproduced
    by decode_chunked.
  * config (cogvideox_5b_infer_sr.yaml): ch 128, mult [1,2,2,4], 3 res
    blocks, z=16, scale_factor 0.7 applied by the engine wrapper.

Layout: channels-last video [B, T, H, W, C].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.norms import group_norm
from ..parallel.context_parallel import (cp_slot_group_norm,
                                         cp_slot_halo_front,
                                         cp_slot_pool_time,
                                         cp_slot_repeat_zq,
                                         cp_slot_upsample_time)

COGVIDEO_VAE_SCALING = 0.7


class CausalConv3d(nn.Module):
    """3D conv with causal time padding and a chunk-carry cache.

    When use_cache=True, the k-1 trailing input frames are stored in the
    'cache' collection and consumed (as front padding) by the next call —
    the functional equivalent of the reference's cache_padding.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    cp_axis: Optional[str] = None   # context-parallel dead-slot mode
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_cache: bool = False,
                 first_chunk: bool = True) -> jax.Array:
        kt, kh, kw = self.kernel_size
        b, t, hh, ww, c = x.shape
        if kt > 1 and self.cp_axis is not None:
            assert not use_cache
            front = cp_slot_halo_front(x, kt, self.cp_axis)
            xp = jnp.concatenate([front, x], axis=1)
        elif kt > 1:
            if use_cache:
                cache = self.variable(
                    'cache', 'pad',
                    lambda: jnp.zeros((b, kt - 1, hh, ww, c), x.dtype))
                if first_chunk:
                    front = jnp.repeat(x[:, :1], kt - 1, axis=1)
                else:
                    front = cache.value
                xp = jnp.concatenate([front, x], axis=1)
                cache.value = xp[:, -(kt - 1):]
            else:
                front = jnp.repeat(x[:, :1], kt - 1, axis=1)
                xp = jnp.concatenate([front, x], axis=1)
        else:
            xp = x
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kt, kh, kw, c, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        out = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kernel.astype(self.dtype), (1, 1, 1),
            [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        return out + bias.astype(self.dtype)


class VideoGroupNorm(nn.Module):
    """GN32 eps 1e-6 over the whole [B,T,H,W,C] video (the encoder's
    gathered norm; per-call stats reproduce the chunked decoder's)."""
    num_groups: int = 32
    eps: float = 1e-6
    cp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        if self.cp_axis is not None:
            # gathered statistics over real slots on every rank. Deviation
            # from the reference: the torch decoder runs gather_norm=False
            # (per-rank stats); gathering everywhere makes CP output exactly
            # equal to the single-device full-clip pass.
            return cp_slot_group_norm(x, scale, bias, self.num_groups,
                                      self.eps, self.cp_axis)
        return group_norm(x, scale, bias, self.num_groups, self.eps)


def _interp_nearest_video(zq: jax.Array, t: int, hh: int, ww: int) -> jax.Array:
    """First-frame-aware nearest resize of zq to (t, hh, ww)
    (cp_enc_dec.py:488-497)."""
    b, tz, hz, wz, c = zq.shape
    if t > 1 and t % 2 == 1 and tz > 1:
        first = jax.image.resize(zq[:, :1], (b, 1, hh, ww, c), 'nearest')
        rest = jax.image.resize(zq[:, 1:], (b, t - 1, hh, ww, c), 'nearest')
        return jnp.concatenate([first, rest], axis=1)
    return jax.image.resize(zq, (b, t, hh, ww, c), 'nearest')


class SpatialNorm3D(nn.Module):
    """zq-modulated GroupNorm: GN(f) * conv_y(zq) + conv_b(zq)
    (cp_enc_dec.py:451-510, add_conv=False)."""
    cp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f: jax.Array, zq: jax.Array, use_cache: bool = False,
                 first_chunk: bool = True) -> jax.Array:
        b, t, hh, ww, c = f.shape
        if self.cp_axis is not None:
            r = (t - 1) // (zq.shape[1] - 1)
            zq = cp_slot_repeat_zq(zq, r, self.cp_axis)
            zq = jax.image.resize(
                zq, (b, t, hh, ww, zq.shape[-1]), 'nearest')
        else:
            zq = _interp_nearest_video(zq, t, hh, ww)
        norm_f = VideoGroupNorm(cp_axis=self.cp_axis, name='norm')(f)
        y = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name='conv_y')(zq)
        bb = CausalConv3d(c, (1, 1, 1), dtype=self.dtype, name='conv_b')(zq)
        return norm_f * y + bb


class ResnetBlock3D(nn.Module):
    out_channels: int
    use_spatial_norm: bool = False
    cp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, use_cache: bool = False,
                 first_chunk: bool = True):
        c = x.shape[-1]

        def norm(v, name):
            if self.use_spatial_norm:
                return SpatialNorm3D(cp_axis=self.cp_axis, dtype=self.dtype,
                                     name=name)(v, zq, use_cache, first_chunk)
            return VideoGroupNorm(cp_axis=self.cp_axis, name=name)(v)

        h = norm(x, 'norm1')
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h = CausalConv3d(self.out_channels, (3, 3, 3), cp_axis=self.cp_axis,
                         dtype=self.dtype, name='conv1')(h, use_cache,
                                                         first_chunk)
        h = norm(h, 'norm2')
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        h = CausalConv3d(self.out_channels, (3, 3, 3), cp_axis=self.cp_axis,
                         dtype=self.dtype, name='conv2')(h, use_cache,
                                                         first_chunk)
        if c != self.out_channels:
            x = CausalConv3d(self.out_channels, (1, 1, 1), dtype=self.dtype,
                             name='nin_shortcut')(x)
        return x + h


class DownSample3D(nn.Module):
    """Spatial: pad (0,1,0,1) + stride-2 conv per frame. Temporal
    (compress_time): avg-pool k2s2, first frame kept when t is odd."""
    channels: int
    compress_time: bool
    cp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        if self.compress_time and self.cp_axis is not None:
            x = cp_slot_pool_time(x, self.cp_axis)
            t = x.shape[1]
        elif self.compress_time and t > 1:
            if t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1] > 0:
                    rest = rest.reshape(b, (t - 1) // 2, 2, hh, ww, c) \
                        .mean(axis=2)
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = x.reshape(b, t // 2, 2, hh, ww, c).mean(axis=2)
            t = x.shape[1]
        xf = x.reshape(b * t, hh, ww, c)
        xf = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)))
        xf = nn.Conv(self.channels, (3, 3), strides=2, padding=0,
                     dtype=self.dtype, name='conv')(xf)
        return xf.reshape(b, t, hh // 2, ww // 2, self.channels)


class UpSample3D(nn.Module):
    """Spatial 2x nearest + conv; compress_time adds 2x temporal nearest
    with the first frame kept single when t is odd (cp_enc_dec.py:531-568)."""
    channels: int
    compress_time: bool
    cp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        if self.compress_time and self.cp_axis is not None:
            x = jax.image.resize(
                cp_slot_upsample_time(x, self.cp_axis),
                (b, 2 * (t - 1) + 1, hh * 2, ww * 2, c), 'nearest')
        elif self.compress_time and t > 1:
            if t % 2 == 1:
                first = jax.image.resize(x[:, 0], (b, hh * 2, ww * 2, c),
                                         'nearest')[:, None]
                rest = jax.image.resize(x[:, 1:],
                                        (b, (t - 1) * 2, hh * 2, ww * 2, c),
                                        'nearest')
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = jax.image.resize(x, (b, t * 2, hh * 2, ww * 2, c),
                                     'nearest')
        else:
            x = jax.image.resize(x, (b, t, hh * 2, ww * 2, c), 'nearest')
        b2, t2, h2, w2, _ = x.shape
        xf = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                     name='conv')(x.reshape(b2 * t2, h2, w2, c))
        return xf.reshape(b2, t2, h2, w2, self.channels)


class CausalEncoder3D(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 3
    z_channels: int = 16
    double_z: bool = True
    temporal_compress_level: int = 2
    cp_axis: Optional[str] = None   # run time-sharded over this mesh axis
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cp = self.cp_axis
        chs = [self.ch * m for m in self.ch_mult]
        h = CausalConv3d(self.ch, (3, 3, 3), cp_axis=cp, dtype=self.dtype,
                         name='conv_in')(x.astype(self.dtype))
        n_lv = len(self.ch_mult)
        for i in range(n_lv):
            for j in range(self.num_res_blocks):
                h = ResnetBlock3D(chs[i], cp_axis=cp, dtype=self.dtype,
                                  name=f'down_{i}_block_{j}')(h)
            if i != n_lv - 1:
                h = DownSample3D(chs[i],
                                 compress_time=i < self.temporal_compress_level,
                                 cp_axis=cp,
                                 dtype=self.dtype, name=f'down_{i}_downsample')(h)
        h = ResnetBlock3D(chs[-1], cp_axis=cp, dtype=self.dtype,
                          name='mid_block_1')(h)
        h = ResnetBlock3D(chs[-1], cp_axis=cp, dtype=self.dtype,
                          name='mid_block_2')(h)
        h = VideoGroupNorm(cp_axis=cp, name='norm_out')(h)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return CausalConv3d(out_c, (3, 3, 3), cp_axis=cp, dtype=self.dtype,
                            name='conv_out')(h)


class CausalDecoder3D(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 3
    z_channels: int = 16
    out_ch: int = 3
    temporal_compress_level: int = 2
    cp_axis: Optional[str] = None   # run time-sharded over this mesh axis
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, use_cache: bool = False, first_chunk: bool = True):
        cp = self.cp_axis
        chs = [self.ch * m for m in self.ch_mult]
        n_lv = len(self.ch_mult)
        zq = z
        kw = dict(use_cache=use_cache, first_chunk=first_chunk)
        h = CausalConv3d(chs[-1], (3, 3, 3), cp_axis=cp, dtype=self.dtype,
                         name='conv_in')(z.astype(self.dtype), **kw)
        h = ResnetBlock3D(chs[-1], use_spatial_norm=True, cp_axis=cp,
                          dtype=self.dtype,
                          name='mid_block_1')(h, zq, **kw)
        h = ResnetBlock3D(chs[-1], use_spatial_norm=True, cp_axis=cp,
                          dtype=self.dtype,
                          name='mid_block_2')(h, zq, **kw)
        for i in reversed(range(n_lv)):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock3D(chs[i], use_spatial_norm=True, cp_axis=cp,
                                  dtype=self.dtype,
                                  name=f'up_{i}_block_{j}')(h, zq, **kw)
            if i != 0:
                h = UpSample3D(
                    h.shape[-1],
                    compress_time=i >= n_lv - self.temporal_compress_level,
                    cp_axis=cp,
                    dtype=self.dtype, name=f'up_{i}_upsample')(h)
        h = SpatialNorm3D(cp_axis=cp, dtype=self.dtype, name='norm_out')(
            h, zq, **kw)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        return CausalConv3d(self.out_ch, (3, 3, 3), cp_axis=cp,
                            dtype=self.dtype, name='conv_out')(h, **kw)


class CogVideoVAE(nn.Module):
    """encode/decode with the engine's 0.7 scale factor
    (diffusion_video.py:196-206)."""
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = CausalEncoder3D(dtype=self.dtype, name='encoder')
        self.decoder = CausalDecoder3D(dtype=self.dtype, name='decoder')

    def encode(self, video: jax.Array, key: Optional[jax.Array] = None
               ) -> jax.Array:
        """[B,T,H,W,3] -> scaled latents [B,(T-1)/4+1,H/8,W/8,16]."""
        moments = self.encoder(video)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * COGVIDEO_VAE_SCALING

    def decode(self, latents: jax.Array, use_cache: bool = False,
               first_chunk: bool = True) -> jax.Array:
        """Scaled latents -> video. One full-clip call == the reference's
        serial chunked decode with carried caches (use decode via chunks +
        'cache' collection for the per-chunk-GN-stats faithful mode)."""
        z = latents / COGVIDEO_VAE_SCALING
        return self.decoder(z, use_cache=use_cache, first_chunk=first_chunk)

    def __call__(self, video, key=None):
        return self.decode(self.encode(video, key))


# ---------------------------------------------------------------------------
# Context-parallel execution (the reference's cp_size>1 mode,
# cp_enc_dec.py:76-441): the clip's time axis is sharded over the mesh
# 'context' axis in the dead-slot layout (parallel/context_parallel.py), the
# whole encoder/decoder runs inside ONE shard_map, halos ride ppermute and
# GroupNorm statistics ride psum over ICI.
# ---------------------------------------------------------------------------

def cp_encode(params, video: jax.Array, mesh, *, axis_name: str = 'context',
              **enc_fields) -> jax.Array:
    """Time-sharded CausalEncoder3D: video [B, 1+P*k, H, W, 3] -> moments
    [B, 1+P*k', H/8, W/8, 2z]. Bit-equal to the single-device encoder (the
    reference's encoder also gathers norm statistics globally)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.context_parallel import (cp_pad_to_slots,
                                             cp_unpad_from_slots, shard_map)
    n = mesh.shape[axis_name]
    enc = CausalEncoder3D(cp_axis=axis_name, **enc_fields)
    spec = P(None, axis_name, None, None, None)
    fn = shard_map(lambda p, v: enc.apply({'params': p}, v), mesh=mesh,
                   in_specs=(P(), spec), out_specs=spec, check_rep=False)
    return cp_unpad_from_slots(fn(params, cp_pad_to_slots(video, n)), n)


def cp_decode(params, z: jax.Array, mesh, *, axis_name: str = 'context',
              **dec_fields) -> jax.Array:
    """Time-sharded CausalDecoder3D: z [B, 1+P*k, h, w, zc] -> video
    [B, 1+P*4k, 8h, 8w, 3]. Matches the single-device FULL-CLIP decode (our
    norms gather globally; the reference's CP decoder uses per-rank
    statistics — see VideoGroupNorm.cp_axis note)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.context_parallel import (cp_pad_to_slots,
                                             cp_unpad_from_slots, shard_map)
    n = mesh.shape[axis_name]
    dec = CausalDecoder3D(cp_axis=axis_name, **dec_fields)
    spec = P(None, axis_name, None, None, None)
    fn = shard_map(lambda p, v: dec.apply({'params': p}, v), mesh=mesh,
                   in_specs=(P(), spec), out_specs=spec, check_rep=False)
    return cp_unpad_from_slots(fn(params, cp_pad_to_slots(z, n)), n)
