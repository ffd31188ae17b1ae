"""Minimal torch re-implementation of diffusers' AutoencoderKLTemporalDecoder
for golden generation — diffusers itself is not installed in this image.

The reference loads this exact class (video_to_video_model.py:16,57-63:
``AutoencoderKLTemporalDecoder.from_pretrained("stabilityai/
stable-video-diffusion-img2vid", subfolder="vae")``) and drives it through
vae_encode (chunk 1) / vae_decode_chunk (3-frame windows, :141-161). This
stub reproduces the diffusers model's module tree (state-dict naming is
IDENTICAL to the published SVD VAE checkpoint so the converter map
star_tpu/convert/tower_maps.py::svd_vae_name_map applies unmodified) and its
forward math:

- Encoder: SD 2D encoder — conv_in, DownEncoderBlock2D (ResnetBlock2D eps
  1e-6 + asymmetric-pad stride-2 Downsample2D), UNetMidBlock2D (res, single
  1-head attention w/ GroupNorm+residual, res), GN+SiLU+conv_out (double z),
  then the AutoencoderKLTemporalDecoder-level quant_conv (1x1, no
  post_quant_conv in this variant).
- TemporalDecoder: conv_in, MidBlockTemporalDecoder / UpBlockTemporalDecoder
  built from SpatioTemporalResBlock (spatial ResnetBlock2D eps 1e-6 +
  TemporalResnetBlock with (3,1,1) convs, eps 1e-5 + learned AlphaBlender
  with switch_spatial_to_temporal_mix=True), nearest-2x Upsample2D, and the
  final (3,1,1) time_conv_out over frames.

Only the pieces the SVD VAE exercises are implemented (no temb paths, no
dropout at eval, fp32); structural params (block_out_channels etc.) are kept
so tiny goldens build scaled-down but wiring-identical graphs.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

__version__ = '0.0-ref-stub'


class ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels=None, eps=1e-6, groups=32):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(self.dropout(F.silu(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """(3,1,1) temporal conv residual block on [B, C, F, H, W]."""

    def __init__(self, in_channels, out_channels=None, eps=1e-5):
        super().__init__()
        out_channels = out_channels or in_channels
        k, p = (3, 1, 1), (1, 0, 0)
        self.norm1 = nn.GroupNorm(32, in_channels, eps=eps)
        self.conv1 = nn.Conv3d(in_channels, out_channels, k, padding=p)
        self.norm2 = nn.GroupNorm(32, out_channels, eps=eps)
        self.conv2 = nn.Conv3d(out_channels, out_channels, k, padding=p)
        self.conv_shortcut = (nn.Conv3d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class AlphaBlender(nn.Module):
    """learned strategy: alpha = sigmoid(mix_factor); with
    switch_spatial_to_temporal_mix the sigmoid weights the TEMPORAL branch."""

    def __init__(self, alpha, merge_strategy='learned',
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        assert merge_strategy == 'learned'
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        self.mix_factor = nn.Parameter(torch.Tensor([alpha]))

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = torch.sigmoid(self.mix_factor)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, in_channels, out_channels=None, eps=1e-6,
                 temporal_eps=None, merge_factor=0.5,
                 merge_strategy='learned',
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        out_channels = out_channels or in_channels
        self.spatial_res_block = ResnetBlock2D(in_channels, out_channels,
                                               eps=eps)
        self.temporal_res_block = TemporalResnetBlock(
            out_channels, out_channels,
            eps=temporal_eps if temporal_eps is not None else eps)
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy=merge_strategy,
            switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix)

    def forward(self, hidden_states, image_only_indicator):
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(hidden_states)
        bf, c, h, w = hidden_states.shape
        bs = bf // num_frames
        mix = hidden_states.reshape(bs, num_frames, c, h, w) \
                           .permute(0, 2, 1, 3, 4)
        ht = self.temporal_res_block(mix)
        out = self.time_mixer(x_spatial=mix, x_temporal=ht,
                              image_only_indicator=image_only_indicator)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class Attention(nn.Module):
    """The VAE mid-block attention: GroupNorm prologue, linear qkv,
    residual connection, identity rescale."""

    def __init__(self, query_dim, heads=1, dim_head=None, eps=1e-6,
                 norm_num_groups=32, bias=True, residual_connection=True):
        super().__init__()
        dim_head = dim_head or query_dim
        inner = heads * dim_head
        self.heads, self.scale = heads, dim_head ** -0.5
        self.group_norm = nn.GroupNorm(norm_num_groups, query_dim, eps=eps)
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(query_dim, inner, bias=bias)
        self.to_v = nn.Linear(query_dim, inner, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=True),
                                     nn.Dropout(0.0)])
        self.residual_connection = residual_connection

    def forward(self, x):
        residual = x
        b, c, h, w = x.shape
        hs = x.view(b, c, h * w).transpose(1, 2)          # [B, HW, C]
        hs = self.group_norm(hs.transpose(1, 2)).transpose(1, 2)
        q, k, v = self.to_q(hs), self.to_k(hs), self.to_v(hs)
        hd = q.shape[-1] // self.heads
        split = lambda t: t.view(b, -1, self.heads, hd).transpose(1, 2)
        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        hs = (attn @ v).transpose(1, 2).reshape(b, -1, self.heads * hd)
        hs = self.to_out[1](self.to_out[0](hs))
        hs = hs.transpose(1, 2).reshape(b, c, h, w)
        if self.residual_connection:
            hs = hs + residual
        return hs


class Downsample2D(nn.Module):
    """SD VAE downsample: pad (0,1,0,1) then stride-2 conv, padding=0."""

    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode='nearest'))


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels if i == 0 else out_channels,
                          out_channels) for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([Downsample2D(out_channels)])
                             if add_downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class UNetMidBlock2D(nn.Module):
    def __init__(self, in_channels, attention_head_dim):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(in_channels),
                                      ResnetBlock2D(in_channels)])
        self.attentions = nn.ModuleList([Attention(
            in_channels, heads=in_channels // attention_head_dim,
            dim_head=attention_head_dim)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(nn.Module):
    def __init__(self, in_channels=3, out_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 double_z=True):
        super().__init__()
        chs = list(block_out_channels)
        self.conv_in = nn.Conv2d(in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        prev = chs[0]
        for i, ch in enumerate(chs):
            self.down_blocks.append(DownEncoderBlock2D(
                prev, ch, layers_per_block,
                add_downsample=i != len(chs) - 1))
            prev = ch
        self.mid_block = UNetMidBlock2D(chs[-1], attention_head_dim=chs[-1])
        self.conv_norm_out = nn.GroupNorm(32, chs[-1], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(
            chs[-1], 2 * out_channels if double_z else out_channels, 3,
            padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(self.conv_act(self.conv_norm_out(x)))


class MidBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, attention_head_dim,
                 num_layers=1):
        super().__init__()
        self.resnets = nn.ModuleList([SpatioTemporalResBlock(
            in_channels if i == 0 else out_channels, out_channels,
            eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
            merge_strategy='learned', switch_spatial_to_temporal_mix=True)
            for i in range(num_layers)])
        self.attentions = nn.ModuleList([Attention(
            in_channels, heads=in_channels // attention_head_dim,
            dim_head=attention_head_dim)])

    def forward(self, x, image_only_indicator):
        x = self.resnets[0](x, image_only_indicator)
        for resnet, attn in zip(self.resnets[1:], self.attentions):
            x = attn(x)
            x = resnet(x, image_only_indicator)
        return x


class UpBlockTemporalDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers,
                 add_upsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([SpatioTemporalResBlock(
            in_channels if i == 0 else out_channels, out_channels,
            eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
            merge_strategy='learned', switch_spatial_to_temporal_mix=True)
            for i in range(num_layers)])
        self.upsamplers = (nn.ModuleList([Upsample2D(out_channels)])
                           if add_upsample else None)

    def forward(self, x, image_only_indicator):
        for r in self.resnets:
            x = r(x, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TemporalDecoder(nn.Module):
    def __init__(self, in_channels=4, out_channels=3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2):
        super().__init__()
        rchs = list(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(in_channels, rchs[0], 3, padding=1)
        self.mid_block = MidBlockTemporalDecoder(
            rchs[0], rchs[0], attention_head_dim=rchs[0],
            num_layers=layers_per_block)
        self.up_blocks = nn.ModuleList()
        prev = rchs[0]
        for i, ch in enumerate(rchs):
            self.up_blocks.append(UpBlockTemporalDecoder(
                prev, ch, layers_per_block + 1,
                add_upsample=i != len(rchs) - 1))
            prev = ch
        self.conv_norm_out = nn.GroupNorm(32, rchs[-1], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(rchs[-1], out_channels, 3, padding=1)
        self.time_conv_out = nn.Conv3d(out_channels, out_channels,
                                       (3, 1, 1), padding=(1, 0, 0))

    def forward(self, sample, image_only_indicator, num_frames=1):
        sample = self.conv_in(sample)
        sample = self.mid_block(sample, image_only_indicator)
        for blk in self.up_blocks:
            sample = blk(sample, image_only_indicator)
        sample = self.conv_out(self.conv_act(self.conv_norm_out(sample)))
        bf, c, h, w = sample.shape
        bs = bf // num_frames
        sample = sample.reshape(bs, num_frames, c, h, w) \
                       .permute(0, 2, 1, 3, 4)
        sample = self.time_conv_out(sample)
        return sample.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class DiagonalGaussianDistribution:
    def __init__(self, moments):
        self.mean, self.logvar = torch.chunk(moments, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.std = torch.exp(0.5 * self.logvar)

    def sample(self, generator=None):
        return self.mean + self.std * torch.randn(
            self.mean.shape, generator=generator, dtype=self.mean.dtype)

    def mode(self):
        return self.mean


class _Out:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class AutoencoderKLTemporalDecoder(nn.Module):
    """encode(images).latent_dist / decode(z, num_frames=...).sample — the
    surface video_to_video_model.py:141-161 drives. No post_quant_conv in
    this diffusers variant; scaling_factor lives on .config."""

    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 scaling_factor=0.18215):
        super().__init__()
        self.encoder = Encoder(in_channels, latent_channels,
                               block_out_channels, layers_per_block)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)
        self.decoder = TemporalDecoder(latent_channels, out_channels,
                                       block_out_channels, layers_per_block)
        self.config = _Out(scaling_factor=scaling_factor,
                           block_out_channels=tuple(block_out_channels),
                           latent_channels=latent_channels)

    @classmethod
    def from_pretrained(cls, *a, **kw):  # parity with the diffusers API
        raise NotImplementedError('ref stub: no hub access in this image')

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        return _Out(latent_dist=DiagonalGaussianDistribution(moments))

    def decode(self, z, num_frames=1):
        bf = z.shape[0]
        indicator = torch.zeros(bf // num_frames, num_frames,
                                dtype=z.dtype, device=z.device)
        return _Out(sample=self.decoder(z, indicator, num_frames=num_frames))
