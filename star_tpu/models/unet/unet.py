"""The STAR I2VGen-XL video UNet + video ControlNet, TPU-first.

Behavioral reference: Vid2VidSDUNet (unet_v2v.py:1281-1709), VideoControlNet
(unet_v2v.py:1896-2291), ControlledV2VUNet (unet_v2v.py:1712-1809).

Architecture (light_deg/heavy_deg checkpoints; config.py:67-88):
  in/out 4ch latents, dim 320, mults [1,2,4,4], 2 res blocks/stage,
  spatial+temporal transformers at scales 1, 1/2, 1/4, head_dim 64,
  text context 1024 (OpenCLIP ViT-H penultimate), time embed 1280.

I/O layout is channels-last video: x [B, F, H, W, C]. Internally the spatial
stream is [B*F, H, W, C]; temporal layers view [B, F, H, W, C].

The encoder/middle trunk is shared between the UNet and the ControlNet via
`is_controlnet`: the ControlNet variant adds per-level zero convs and returns
the 13 control residuals; the UNet variant consumes them (middle add + skip
adds) and runs the decoder — matching the reference's weight topology so one
converter handles both.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (Attention, Downsample, GroupNorm, ResBlock,
                     SpatialTransformer, TemporalTransformer, Upsample,
                     sinusoidal_embedding)


class VideoUNetTrunk(nn.Module):
    """Encoder + middle of Vid2VidSDUNet; optionally the decoder (UNet mode)
    or zero-conv taps (ControlNet mode)."""
    dim: int = 320
    in_channels: int = 4
    out_channels: int = 4
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Sequence[float] = (1.0, 0.5, 0.25)
    head_dim: int = 64
    num_heads_init_temporal: int = 8
    context_dim: int = 1024
    dropout: float = 0.1
    is_controlnet: bool = False
    remat: bool = False   # rematerialize blocks (training; replaces the
    #                       reference's fairscale checkpoint_wrapper)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, y: jax.Array,
                 hint: Optional[jax.Array] = None,
                 controls: Optional[Tuple[jax.Array, ...]] = None,
                 deterministic: bool = True, cfg_pair: bool = False):
        # cfg_pair: x/t/hint carry ONE copy of a CFG pair while y carries
        # both halves ([2B, ...], uncond layout decided by the caller). The
        # cond/uncond streams are bit-identical until the first text
        # cross-attention, so everything before it runs at half batch and is
        # tiled at the split point (incl. skip taps / control residuals).
        b, f, hh, ww, cin = x.shape
        dim, hd = self.dim, self.head_dim
        embed_dim = dim * 4

        # --- timestep embedding + per-frame broadcast ------------------------
        e = sinusoidal_embedding(t, dim)                       # [B, dim] fp32
        e = nn.Dense(embed_dim, dtype=jnp.float32, name='time_embed_1')(e)
        e = jax.nn.silu(e)
        e = nn.Dense(embed_dim, dtype=jnp.float32, name='time_embed_2')(e)
        e = jnp.repeat(e.astype(self.dtype), f, axis=0)        # [BF, E]
        context = jnp.repeat(y.astype(self.dtype), f, axis=0)  # [BF, L, Cc]
        if cfg_pair:
            assert y.shape[0] == 2 * b, (y.shape, b)

        x = x.astype(self.dtype).reshape(b * f, hh, ww, cin)

        # remat: recompute block activations in the backward pass
        # (unet_v2v.py:1639 wraps every block in fairscale checkpoint_wrapper)
        SpatialTx = (nn.remat(SpatialTransformer, static_argnums=(3,))
                     if self.remat else SpatialTransformer)
        TemporalTx = (nn.remat(TemporalTransformer) if self.remat
                      else TemporalTransformer)
        Res = (nn.remat(ResBlock, static_argnums=(3, 4)) if self.remat
               else ResBlock)

        split_pending = cfg_pair

        def run_spatial(c, name, x):
            nonlocal split_pending, e, xs
            mod = SpatialTx(c, c // hd, hd, dtype=self.dtype, name=name)
            if split_pending:
                x = mod(x, context, True)
                # the pair diverges here: everything downstream runs at 2B
                split_pending = False
                e = jnp.concatenate([e, e], axis=0)
                xs = [jnp.concatenate([s, s], axis=0) for s in xs]
                return x
            # pass cfg_split positionally even when False: under nn.remat
            # the static_argnums=(3,) index must exist on every call
            return mod(x, context, False)

        def temporal_tx(c, name, num_heads=None):
            nheads = (c // hd) if num_heads is None else num_heads
            return TemporalTx(c, nheads, hd, dtype=self.dtype, name=name)

        def run_temporal(mod, x):
            bf = x.shape[0]
            x5 = x.reshape(-1, f, *x.shape[1:])
            x5 = mod(x5)
            return x5.reshape(bf, *x.shape[1:])

        def zero_conv(c, name):
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name=name)

        # --- encoder ---------------------------------------------------------
        enc_dims = [dim * u for u in (1,) + tuple(self.dim_mult)]
        scale = 1.0
        xs = []           # skip tensors (UNet) / zero-conv taps (ControlNet)
        tap_idx = 0

        def tap(xcur):
            nonlocal tap_idx
            if self.is_controlnet:
                xs.append(zero_conv(xcur.shape[-1], f'zero_conv_{tap_idx}')(xcur))
            else:
                xs.append(xcur)
            tap_idx += 1

        # init block: conv_in (+ hint injection) + temporal transformer
        x = nn.Conv(dim, (3, 3), padding=1, dtype=self.dtype, name='conv_in')(x)
        if self.is_controlnet:
            assert hint is not None
            hint_flat = hint.astype(self.dtype).reshape(b * f, hh, ww, -1)
            # zero-init 3x3 conv; added right after conv_in (unet_v2v.py:2186-2194)
            hint_emb = nn.Conv(dim, (3, 3), padding=1, dtype=self.dtype,
                               kernel_init=nn.initializers.zeros,
                               name='input_hint')(hint_flat)
            x = x + hint_emb
        x = run_temporal(
            temporal_tx(dim, 'init_temporal', self.num_heads_init_temporal), x)
        tap(x)

        for i, (in_d, out_d) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
            for j in range(self.num_res_blocks):
                x = Res(out_d, dropout=self.dropout, dtype=self.dtype,
                             name=f'enc_{i}_{j}_res')(
                                 x, e, f, deterministic)
                if scale in self.attn_scales:
                    x = run_spatial(out_d, f'enc_{i}_{j}_spatial', x)
                    x = run_temporal(temporal_tx(out_d, f'enc_{i}_{j}_temporal'), x)
                tap(x)
            if i != len(self.dim_mult) - 1:
                x = Downsample(out_d, dtype=self.dtype, name=f'enc_{i}_down')(x)
                scale /= 2.0
                tap(x)

        # --- middle ----------------------------------------------------------
        mid_d = enc_dims[-1]
        x = Res(mid_d, dropout=self.dropout, dtype=self.dtype,
                     name='mid_res1')(x, e, f, deterministic)
        x = run_spatial(mid_d, 'mid_spatial', x)
        x = run_temporal(temporal_tx(mid_d, 'mid_temporal'), x)
        x = Res(mid_d, dropout=self.dropout, dtype=self.dtype,
                     name='mid_res2')(x, e, f, deterministic)

        if self.is_controlnet:
            xs.append(zero_conv(mid_d, 'middle_out')(x))
            return tuple(xs)

        # --- decoder (UNet mode) ----------------------------------------------
        controls_list = list(controls) if controls is not None else None
        if controls_list is not None:
            x = x + controls_list.pop().astype(self.dtype)

        dec_dims = [dim * u for u in (self.dim_mult[-1],) + tuple(self.dim_mult[::-1])]
        for i, (in_d, out_d) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
            for j in range(self.num_res_blocks + 1):
                skip = xs.pop()
                if controls_list is not None:
                    skip = skip + controls_list.pop().astype(self.dtype)
                x = jnp.concatenate([x, skip], axis=-1)
                x = Res(out_d, dropout=self.dropout, dtype=self.dtype,
                             name=f'dec_{i}_{j}_res')(
                                 x, e, f, deterministic)
                if scale in self.attn_scales:
                    x = run_spatial(out_d, f'dec_{i}_{j}_spatial', x)
                    x = run_temporal(temporal_tx(out_d, f'dec_{i}_{j}_temporal'), x)
                if i != len(self.dim_mult) - 1 and j == self.num_res_blocks:
                    x = Upsample(out_d, dtype=self.dtype, name=f'dec_{i}_up')(x)
                    scale *= 2.0

        # --- head --------------------------------------------------------------
        x = GroupNorm(name='head_norm')(x)
        x = jax.nn.silu(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name='head_conv')(x)
        if split_pending:   # cfg_pair with no cross-attn anywhere: tile late
            x = jnp.concatenate([x, x], axis=0)
        return x.reshape(-1, f, hh, ww, self.out_channels)


class ControlledV2VUNet(nn.Module):
    """UNet + video ControlNet; hint is the LQ latent (unet_v2v.py:1712-1809).

    __call__(x, t, y, hint) -> v-prediction, all [B, F, H, W, 4] channels-last.

    Non-default dims build a structurally identical scaled-down pair (used by
    the golden-parity tests against a same-config torch reference model).
    """
    dtype: jnp.dtype = jnp.float32
    dim: int = 320
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Sequence[float] = (1.0, 0.5, 0.25)
    head_dim: int = 64
    num_heads_init_temporal: int = 8
    context_dim: int = 1024
    remat: bool = False

    def setup(self):
        kw = dict(dim=self.dim, dim_mult=self.dim_mult,
                  num_res_blocks=self.num_res_blocks,
                  attn_scales=self.attn_scales, head_dim=self.head_dim,
                  num_heads_init_temporal=self.num_heads_init_temporal,
                  context_dim=self.context_dim, remat=self.remat,
                  dtype=self.dtype)
        self.unet = VideoUNetTrunk(name='unet', **kw)
        self.controlnet = VideoUNetTrunk(name='controlnet',
                                         is_controlnet=True, **kw)

    def __call__(self, x: jax.Array, t: jax.Array, y: jax.Array,
                 hint: jax.Array, deterministic: bool = True,
                 cfg_pair: bool = False) -> jax.Array:
        """cfg_pair: pass x/t/hint as ONE copy ([B, ...]) and y as the CFG
        pair ([2B, ...]); the y-independent prefix (conv_in, hint conv, init
        temporal, first ResBlock, first LIEM/self-attn — in BOTH trunks) runs
        once instead of twice. Output is [2B, ...] in y's half order."""
        controls = self.controlnet(x, t, y, hint=hint,
                                   deterministic=deterministic,
                                   cfg_pair=cfg_pair)
        return self.unet(x, t, y, controls=controls,
                         deterministic=deterministic, cfg_pair=cfg_pair)
