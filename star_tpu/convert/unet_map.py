"""Name map: reference ControlledV2VUNet torch state_dict -> star_tpu
VideoUNetTrunk param tree.

Torch module topology (unet_v2v.py): input_blocks[0]=[Conv2d, TemporalTx],
then per encoder stage i: two [ResBlock(+Spatial/Temporal Tx at attn scales)]
blocks and a Downsample (stages 0-2); middle_block=[Res, Spatial, Temporal,
Res]; output_blocks: 4 stages x 3 blocks (+Upsample at stage end, stages 0-2);
out=[GN, SiLU, Conv]. The ControlNet clone adds zero_convs[k],
middle_block_out and input_hint_block, all under the 'VideoControlNet.'
prefix of the combined state dict (unet_v2v.py:1712-1715).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from .layout import (conv1d_as_dense, conv2d_kernel, conv3d_t11_kernel,
                     linear_kernel)

# flax leaf path (joined with '/') -> (torch name, converter or None=identity)
Entry = Tuple[str, Callable[[np.ndarray], np.ndarray] | None]
NameMap = Dict[str, Entry]

def _attn_stages(dim_mult, attn_scales):
    """Which stages carry spatial+temporal transformers: the running scale
    starts at 1.0 and halves after each encoder downsample (unet_v2v.py:1335,
    1436); the decoder walks it back up."""
    enc = tuple((0.5 ** i) in tuple(attn_scales) for i in range(len(dim_mult)))
    return enc, enc[::-1]


def _norm(dst: str, src: str, m: NameMap):
    m[f'{dst}/scale'] = (f'{src}.weight', None)
    m[f'{dst}/bias'] = (f'{src}.bias', None)


def _conv2d(dst: str, src: str, m: NameMap, bias=True):
    m[f'{dst}/kernel'] = (f'{src}.weight', conv2d_kernel)
    if bias:
        m[f'{dst}/bias'] = (f'{src}.bias', None)


def _dense(dst: str, src: str, m: NameMap, bias=True):
    m[f'{dst}/kernel'] = (f'{src}.weight', linear_kernel)
    if bias:
        m[f'{dst}/bias'] = (f'{src}.bias', None)


def _conv1d_dense(dst: str, src: str, m: NameMap, bias=True):
    m[f'{dst}/kernel'] = (f'{src}.weight', conv1d_as_dense)
    if bias:
        m[f'{dst}/bias'] = (f'{src}.bias', None)


def _conv3d(dst: str, src: str, m: NameMap, bias=True):
    m[f'{dst}/kernel'] = (f'{src}.weight', conv3d_t11_kernel)
    if bias:
        m[f'{dst}/bias'] = (f'{src}.bias', None)


def _attention(dst: str, src: str, m: NameMap):
    _dense(f'{dst}/to_q', f'{src}.to_q', m, bias=False)
    _dense(f'{dst}/to_k', f'{src}.to_k', m, bias=False)
    _dense(f'{dst}/to_v', f'{src}.to_v', m, bias=False)
    _dense(f'{dst}/to_out', f'{src}.to_out.0', m)


def _spatial_block(dst: str, src: str, m: NameMap):
    # BasicTransformerBlock, 'space' flavor
    _conv2d(f'{dst}/local1/conv', f'{src}.local1.conv1', m, bias=False)
    _attention(f'{dst}/attn1', f'{src}.attn1', m)
    _attention(f'{dst}/attn2', f'{src}.attn2', m)
    for k in (1, 2, 3):
        _norm(f'{dst}/norm{k}', f'{src}.norm{k}', m)
    _dense(f'{dst}/ff/proj', f'{src}.ff.net.0.proj', m)
    _dense(f'{dst}/ff/out', f'{src}.ff.net.2', m)


def _temporal_block(dst: str, src: str, m: NameMap):
    _dense(f'{dst}/local1/proj', f'{src}.local1.conv1', m, bias=False)
    _dense(f'{dst}/local2/proj', f'{src}.local2.conv1', m, bias=False)
    _attention(f'{dst}/attn1', f'{src}.attn1', m)
    _attention(f'{dst}/attn2', f'{src}.attn2', m)
    for k in (1, 2, 3):
        _norm(f'{dst}/norm{k}', f'{src}.norm{k}', m)
    _dense(f'{dst}/ff/proj', f'{src}.ff.net.0.proj', m)
    _dense(f'{dst}/ff/out', f'{src}.ff.net.2', m)


def _spatial_tx(dst: str, src: str, m: NameMap):
    _norm(f'{dst}/norm', f'{src}.norm', m)
    _dense(f'{dst}/proj_in', f'{src}.proj_in', m)     # use_linear=True
    _dense(f'{dst}/proj_out', f'{src}.proj_out', m)
    _spatial_block(f'{dst}/block', f'{src}.transformer_blocks.0', m)


def _temporal_tx(dst: str, src: str, m: NameMap):
    _norm(f'{dst}/norm', f'{src}.norm', m)
    _conv1d_dense(f'{dst}/proj_in', f'{src}.proj_in', m)   # Conv1d k=1
    _conv1d_dense(f'{dst}/proj_out', f'{src}.proj_out', m)
    _temporal_block(f'{dst}/block', f'{src}.transformer_blocks.0', m)


def _temporal_conv(dst: str, src: str, m: NameMap):
    # TemporalConvBlock_v2: convK = Sequential(GN, SiLU, [Dropout,] Conv3d)
    for k, conv_idx in (('conv1', 2), ('conv2', 3), ('conv3', 3), ('conv4', 3)):
        _norm(f'{dst}/{k}_norm', f'{src}.{k}.0', m)
        _conv3d(f'{dst}/{k}', f'{src}.{k}.{conv_idx}', m)


def _res_block(dst: str, src: str, m: NameMap, has_skip: bool,
               temporal: bool = True):
    _norm(f'{dst}/in_norm', f'{src}.in_layers.0', m)
    _conv2d(f'{dst}/in_conv', f'{src}.in_layers.2', m)
    _dense(f'{dst}/emb_proj', f'{src}.emb_layers.1', m)
    _norm(f'{dst}/out_norm', f'{src}.out_layers.0', m)
    _conv2d(f'{dst}/out_conv', f'{src}.out_layers.3', m)
    if has_skip:
        _conv2d(f'{dst}/skip', f'{src}.skip_connection', m)
    if temporal:
        # note the reference's attribute spelling: 'temopral_conv'
        _temporal_conv(f'{dst}/temporal_conv', f'{src}.temopral_conv', m)


def trunk_name_map(is_controlnet: bool, dim: int = 320,
                   dim_mult=(1, 2, 4, 4), num_res_blocks: int = 2,
                   attn_scales=(1.0, 0.5, 0.25)) -> NameMap:
    """Map for one VideoUNetTrunk vs one torch Vid2VidSDUNet/VideoControlNet
    (state-dict names relative to the net, no 'VideoControlNet.' prefix)."""
    attn_enc, attn_dec = _attn_stages(dim_mult, attn_scales)
    m: NameMap = {}
    _dense('time_embed_1', 'time_embed.0', m)
    _dense('time_embed_2', 'time_embed.2', m)
    _conv2d('conv_in', 'input_blocks.0.0', m)
    _temporal_tx('init_temporal', 'input_blocks.0.1', m)
    if is_controlnet:
        _conv2d('input_hint', 'input_hint_block', m)

    enc_dims = [dim * u for u in (1,) + tuple(dim_mult)]
    blk = 1
    tap = 1  # zero_conv index (0 is the init block's)
    if is_controlnet:
        _conv2d('zero_conv_0', 'zero_convs.0.0', m)
    for i, (in_d, out_d) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for j in range(num_res_blocks):
            src = f'input_blocks.{blk}'
            _res_block(f'enc_{i}_{j}_res', f'{src}.0', m,
                       has_skip=(in_d if j == 0 else out_d) != out_d)
            if attn_enc[i]:
                _spatial_tx(f'enc_{i}_{j}_spatial', f'{src}.1', m)
                _temporal_tx(f'enc_{i}_{j}_temporal', f'{src}.2', m)
            if is_controlnet:
                _conv2d(f'zero_conv_{tap}', f'zero_convs.{tap}.0', m)
            blk += 1
            tap += 1
        if i != len(dim_mult) - 1:
            _conv2d(f'enc_{i}_down/conv', f'input_blocks.{blk}.op', m)
            if is_controlnet:
                _conv2d(f'zero_conv_{tap}', f'zero_convs.{tap}.0', m)
            blk += 1
            tap += 1

    _res_block('mid_res1', 'middle_block.0', m, has_skip=False)
    _spatial_tx('mid_spatial', 'middle_block.1', m)
    _temporal_tx('mid_temporal', 'middle_block.2', m)
    _res_block('mid_res2', 'middle_block.3', m, has_skip=False)
    if is_controlnet:
        _conv2d('middle_out', 'middle_block_out.0', m)
        return m

    # decoder (UNet only); every dec ResBlock sees concat input -> has skip
    blk = 0
    for i in range(len(dim_mult)):
        for j in range(num_res_blocks + 1):
            src = f'output_blocks.{blk}'
            _res_block(f'dec_{i}_{j}_res', f'{src}.0', m, has_skip=True)
            idx = 1
            if attn_dec[i]:
                _spatial_tx(f'dec_{i}_{j}_spatial', f'{src}.{idx}', m)
                _temporal_tx(f'dec_{i}_{j}_temporal', f'{src}.{idx + 1}', m)
                idx += 2
            if i != len(dim_mult) - 1 and j == num_res_blocks:
                _conv2d(f'dec_{i}_up/conv', f'{src}.{idx}.conv', m)
            blk += 1

    _norm('head_norm', 'out.0', m)
    _conv2d('head_conv', 'out.2', m)
    return m


def controlled_unet_name_map(**cfg) -> NameMap:
    """Full ControlledV2VUNet: 'unet/...' from the top-level names,
    'controlnet/...' from the 'VideoControlNet.' prefix. `cfg` forwards
    dim/dim_mult/num_res_blocks/attn_scales for scaled-down variants."""
    m: NameMap = {}
    for path, (src, fn) in trunk_name_map(False, **cfg).items():
        m[f'unet/{path}'] = (src, fn)
    for path, (src, fn) in trunk_name_map(True, **cfg).items():
        m[f'controlnet/{path}'] = (f'VideoControlNet.{src}', fn)
    return m
