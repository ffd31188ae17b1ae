"""Name maps for the auxiliary towers: OpenCLIP text, SVD temporal VAE,
T5 encoder, CogVideoX DiT (SAT checkpoint naming).

Sources of the torch-side names:
  * OpenCLIP: open_clip's CLIP text tower (embedder.py:54-72 walks
    model.token_embedding/positional_embedding/transformer.resblocks/ln_final)
  * SVD VAE: diffusers AutoencoderKLTemporalDecoder module tree
    (video_to_video_model.py:57-63)
  * T5: HF T5EncoderModel (modules.py:234-281)
  * DiT: SAT BaseModel checkpoints (dit_video_concat.py mixins +
    transformer.layers.* from sat's TP transformer)
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from .layout import (conv2d_kernel, conv3d_t11_kernel, linear_kernel)
from .unet_map import NameMap, _conv2d, _dense, _norm


# --------------------------------------------------------------------- CLIP

def _split_in_proj(idx: int):
    """open_clip packs qkv as in_proj_weight [3C, C]; our CLIPAttention uses
    one packed Dense too, so only a transpose is needed."""
    return linear_kernel


def clip_text_name_map(layers: int = 24, penultimate: bool = True) -> NameMap:
    m: NameMap = {}
    m['token_embedding'] = ('token_embedding.weight', None)
    m['positional_embedding'] = ('positional_embedding', None)
    n_blocks = layers - (1 if penultimate else 0)
    for i in range(n_blocks):
        src = f'transformer.resblocks.{i}'
        dst = f'resblock_{i}'
        _norm(f'{dst}/ln_1', f'{src}.ln_1', m)
        m[f'{dst}/attn/in_proj/kernel'] = (f'{src}.attn.in_proj_weight',
                                           linear_kernel)
        m[f'{dst}/attn/in_proj/bias'] = (f'{src}.attn.in_proj_bias', None)
        _dense(f'{dst}/attn/out_proj', f'{src}.attn.out_proj', m)
        _norm(f'{dst}/ln_2', f'{src}.ln_2', m)
        _dense(f'{dst}/mlp_fc', f'{src}.mlp.c_fc', m)
        _dense(f'{dst}/mlp_proj', f'{src}.mlp.c_proj', m)
    _norm('ln_final', 'ln_final', m)
    return m


def hf_clip_text_to_open_clip_sd(sd: dict) -> dict:
    """Rename an HF CLIPTextModel state dict (laion/CLIP-ViT-H-14 is shipped
    in this format) to open_clip's text-tower naming so clip_text_name_map
    applies. HF stores q/k/v separately; open_clip packs them (q;k;v) into
    in_proj_weight/in_proj_bias."""
    out = {}
    pfx = 'text_model.'
    for k, v in sd.items():
        if not k.startswith(pfx):
            continue
        k = k[len(pfx):]
        if k == 'embeddings.token_embedding.weight':
            out['token_embedding.weight'] = v
        elif k == 'embeddings.position_embedding.weight':
            out['positional_embedding'] = v
        elif k.startswith('final_layer_norm.'):
            out['ln_final.' + k.split('.', 1)[1]] = v
        elif k.startswith('encoder.layers.'):
            _, _, i, rest = k.split('.', 3)
            dst = f'transformer.resblocks.{i}.'
            rest = (rest
                    .replace('layer_norm1.', 'ln_1.')
                    .replace('layer_norm2.', 'ln_2.')
                    .replace('mlp.fc1.', 'mlp.c_fc.')
                    .replace('mlp.fc2.', 'mlp.c_proj.')
                    .replace('self_attn.out_proj.', 'attn.out_proj.'))
            if rest.startswith('self_attn.'):
                continue  # q/k/v packed below
            out[dst + rest] = v
    # pack qkv
    import re
    layers = {int(mt.group(1)) for k in sd
              if (mt := re.match(r'text_model\.encoder\.layers\.(\d+)\.', k))}
    for i in sorted(layers):
        src = f'text_model.encoder.layers.{i}.self_attn.'
        dst = f'transformer.resblocks.{i}.attn.'
        for part in ('weight', 'bias'):
            out[dst + f'in_proj_{part}'] = np.concatenate(
                [np.asarray(sd[src + f'{p}_proj.{part}'])
                 for p in ('q', 'k', 'v')], axis=0)
    return out


# ------------------------------------------------------------------ SVD VAE

def _resnet2d(dst: str, src: str, m: NameMap, shortcut: bool):
    _norm(f'{dst}/norm1', f'{src}.norm1', m)
    _conv2d(f'{dst}/conv1', f'{src}.conv1', m)
    _norm(f'{dst}/norm2', f'{src}.norm2', m)
    _conv2d(f'{dst}/conv2', f'{src}.conv2', m)
    if shortcut:
        _conv2d(f'{dst}/conv_shortcut', f'{src}.conv_shortcut', m)


def _temporal_resnet(dst: str, src: str, m: NameMap):
    _norm(f'{dst}/norm1', f'{src}.norm1', m)
    m[f'{dst}/conv1/kernel'] = (f'{src}.conv1.weight', conv3d_t11_kernel)
    m[f'{dst}/conv1/bias'] = (f'{src}.conv1.bias', None)
    _norm(f'{dst}/norm2', f'{src}.norm2', m)
    m[f'{dst}/conv2/kernel'] = (f'{src}.conv2.weight', conv3d_t11_kernel)
    m[f'{dst}/conv2/bias'] = (f'{src}.conv2.bias', None)


def _spatio_temporal(dst: str, src: str, m: NameMap, shortcut: bool = False):
    _resnet2d(f'{dst}/spatial_res_block', f'{src}.spatial_res_block', m,
              shortcut)
    _temporal_resnet(f'{dst}/temporal_res_block', f'{src}.temporal_res_block',
                     m)
    m[f'{dst}/mix_factor'] = (f'{src}.time_mixer.mix_factor',
                              lambda a: np.reshape(a, (1,)))


def _vae_attention(dst: str, src: str, m: NameMap):
    _norm(f'{dst}/group_norm', f'{src}.group_norm', m)
    _dense(f'{dst}/to_q', f'{src}.to_q', m)
    _dense(f'{dst}/to_k', f'{src}.to_k', m)
    _dense(f'{dst}/to_v', f'{src}.to_v', m)
    _dense(f'{dst}/to_out', f'{src}.to_out.0', m)


def svd_vae_name_map(block_out_channels=(128, 256, 512, 512),
                     layers_per_block: int = 2) -> NameMap:
    m: NameMap = {}
    chs = list(block_out_channels)
    # encoder
    _conv2d('encoder/conv_in', 'encoder.conv_in', m)
    prev = chs[0]
    for i, ch in enumerate(chs):
        for j in range(layers_per_block):
            _resnet2d(f'encoder/down_{i}_res_{j}',
                      f'encoder.down_blocks.{i}.resnets.{j}', m,
                      shortcut=(prev if j == 0 else ch) != ch)
        prev = ch
        if i != len(chs) - 1:
            _conv2d(f'encoder/down_{i}_downsample',
                    f'encoder.down_blocks.{i}.downsamplers.0.conv', m)
    _resnet2d('encoder/mid_res_1', 'encoder.mid_block.resnets.0', m, False)
    _vae_attention('encoder/mid_attn', 'encoder.mid_block.attentions.0', m)
    _resnet2d('encoder/mid_res_2', 'encoder.mid_block.resnets.1', m, False)
    _norm('encoder/conv_norm_out', 'encoder.conv_norm_out', m)
    _conv2d('encoder/conv_out', 'encoder.conv_out', m)
    _conv2d('encoder/quant_conv', 'quant_conv', m)

    # temporal decoder
    _conv2d('decoder/conv_in', 'decoder.conv_in', m)
    _spatio_temporal('decoder/mid_res_0', 'decoder.mid_block.resnets.0', m)
    _vae_attention('decoder/mid_attn', 'decoder.mid_block.attentions.0', m)
    _spatio_temporal('decoder/mid_res_1', 'decoder.mid_block.resnets.1', m)
    rchs = list(reversed(chs))
    prev = rchs[0]
    for i, ch in enumerate(rchs):
        for j in range(layers_per_block + 1):
            _spatio_temporal(f'decoder/up_{i}_res_{j}',
                             f'decoder.up_blocks.{i}.resnets.{j}', m,
                             shortcut=(prev if j == 0 else ch) != ch)
        prev = ch
        if i != len(rchs) - 1:
            _conv2d(f'decoder/up_{i}_upsample',
                    f'decoder.up_blocks.{i}.upsamplers.0.conv', m)
    _norm('decoder/conv_norm_out', 'decoder.conv_norm_out', m)
    _conv2d('decoder/conv_out', 'decoder.conv_out', m)
    m['decoder/time_conv_out/kernel'] = ('decoder.time_conv_out.weight',
                                         conv3d_t11_kernel)
    m['decoder/time_conv_out/bias'] = ('decoder.time_conv_out.bias', None)
    return m


# ----------------------------------------------------------------------- T5

def t5_encoder_name_map(num_layers: int = 24) -> NameMap:
    m: NameMap = {}
    m['token_embedding'] = ('shared.weight', None)
    m['relative_attention_bias'] = (
        'encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight',
        None)
    for i in range(num_layers):
        src = f'encoder.block.{i}'
        dst = f'block_{i}'
        for p in ('q', 'k', 'v', 'o'):
            m[f'{dst}/{p}/kernel'] = (
                f'{src}.layer.0.SelfAttention.{p}.weight', linear_kernel)
        m[f'{dst}/ln_attn/scale'] = (f'{src}.layer.0.layer_norm.weight', None)
        for p in ('wi_0', 'wi_1', 'wo'):
            m[f'{dst}/{p}/kernel'] = (
                f'{src}.layer.1.DenseReluDense.{p}.weight', linear_kernel)
        m[f'{dst}/ln_mlp/scale'] = (f'{src}.layer.1.layer_norm.weight', None)
    m['final_norm/scale'] = ('encoder.final_layer_norm.weight', None)
    return m


# -------------------------------------------------------------- CogVideo DiT

def dit_name_map(num_layers: int = 42) -> Dict[str, object]:
    """Per-layer map entries use '{i}' placeholders; convert_dit stacks them
    along the leading axis for the nn.scan layout. LoRA (SAT lora2) is merged
    into qkv/dense at conversion time by merge_sat_lora() before this map is
    applied."""
    per_layer = {
        'adaln/kernel': ('mixins.adaln_layer.adaLN_modulations.{i}.1.weight',
                         linear_kernel),
        'adaln/bias': ('mixins.adaln_layer.adaLN_modulations.{i}.1.bias',
                       None),
        'q_ln_scale': ('mixins.adaln_layer.query_layernorm_list.{i}.weight',
                       None),
        'q_ln_bias': ('mixins.adaln_layer.query_layernorm_list.{i}.bias',
                      None),
        'k_ln_scale': ('mixins.adaln_layer.key_layernorm_list.{i}.weight',
                       None),
        'k_ln_bias': ('mixins.adaln_layer.key_layernorm_list.{i}.bias', None),
        'input_ln_scale': ('transformer.layers.{i}.input_layernorm.weight',
                           None),
        'input_ln_bias': ('transformer.layers.{i}.input_layernorm.bias',
                          None),
        'post_ln_scale': (
            'transformer.layers.{i}.post_attention_layernorm.weight', None),
        'post_ln_bias': (
            'transformer.layers.{i}.post_attention_layernorm.bias', None),
        'qkv/base/kernel': (
            'transformer.layers.{i}.attention.query_key_value.weight',
            linear_kernel),
        'qkv/base/bias': (
            'transformer.layers.{i}.attention.query_key_value.bias', None),
        'dense/base/kernel': ('transformer.layers.{i}.attention.dense.weight',
                              linear_kernel),
        'dense/base/bias': ('transformer.layers.{i}.attention.dense.bias',
                            None),
        'mlp_fc/kernel': ('transformer.layers.{i}.mlp.dense_h_to_4h.weight',
                          linear_kernel),
        'mlp_fc/bias': ('transformer.layers.{i}.mlp.dense_h_to_4h.bias',
                        None),
        'mlp_proj/kernel': ('transformer.layers.{i}.mlp.dense_4h_to_h.weight',
                            linear_kernel),
        'mlp_proj/bias': ('transformer.layers.{i}.mlp.dense_4h_to_h.bias',
                          None),
        'spa_local/conv/kernel': ('transformer.layers.{i}.spa_local.conv1.weight',
                                  conv2d_kernel),
        'temp_local/proj/kernel': ('transformer.layers.{i}.temp_local.conv1.weight',
                                   linear_kernel),
    }
    top = {
        'time_embed_1/kernel': ('time_embed.0.weight', linear_kernel),
        'time_embed_1/bias': ('time_embed.0.bias', None),
        'time_embed_2/kernel': ('time_embed.2.weight', linear_kernel),
        'time_embed_2/bias': ('time_embed.2.bias', None),
        'proj_sr/kernel': ('mixins.patch_embed.proj_sr.weight', conv2d_kernel),
        'proj_sr/bias': ('mixins.patch_embed.proj_sr.bias', None),
        'text_proj/kernel': ('mixins.patch_embed.text_proj.weight',
                             linear_kernel),
        'text_proj/bias': ('mixins.patch_embed.text_proj.bias', None),
        'pre_final_ln_scale': ('transformer.final_layernorm.weight', None),
        'pre_final_ln_bias': ('transformer.final_layernorm.bias', None),
        'final_ln_scale': ('mixins.final_layer.norm_final.weight', None),
        'final_ln_bias': ('mixins.final_layer.norm_final.bias', None),
        'final_linear/kernel': ('mixins.final_layer.linear.weight',
                                linear_kernel),
        'final_linear/bias': ('mixins.final_layer.linear.bias', None),
        'final_adaln/kernel': ('mixins.final_layer.adaLN_modulation.1.weight',
                               linear_kernel),
        'final_adaln/bias': ('mixins.final_layer.adaLN_modulation.1.bias',
                             None),
    }
    return {'per_layer': per_layer, 'top': top, 'num_layers': num_layers}


def merge_sat_lora(state_dict: dict, alpha_over_r: float = 1.0) -> dict:
    """Fold SAT lora2 LoraMixin weights (matrix_A/matrix_B pairs attached to
    attention projections) into their base weights: W <- W + B @ A * scale.

    SAT lora2 key shape: '...attention.query_key_value.matrix_A.{part}' —
    naming varies across sat versions, so this matches any '*.matrix_A*'
    suffix and merges into the sibling '.weight'. Unmatched pairs raise."""
    import re
    sd = dict(state_dict)
    lora_as = [k for k in sd if '.matrix_A' in k]
    for ka in lora_as:
        kb = ka.replace('.matrix_A', '.matrix_B')
        base = re.sub(r'\.matrix_A.*$', '.weight', ka)
        if kb not in sd or base not in sd:
            raise KeyError(f'unpaired LoRA weight {ka}')
        a, b, w = sd[ka], sd[kb], sd[base]
        sd[base] = w + (b @ a) * alpha_over_r
        del sd[ka], sd[kb]
    return sd


def convert_dit(state_dict, num_layers: int = 42, dtype=None,
                num_heads: int = 48):
    """-> nested param tree for CogVideoDiT (scan_layers layout).

    Applies the RoPE half-split head-dim permutation (dit.rope_head_perm)
    to the q/k projection outputs and qk-LN params: our DiT rotates halves
    (one lane shift on TPU) instead of interleaved pairs; logits are
    invariant because q and k share the permutation."""
    from .convert import _to_numpy, nest
    dmap = dit_name_map(num_layers)
    flat = {}
    for dst, (src, fn) in dmap['top'].items():
        arr = _to_numpy(state_dict[src])
        flat[dst] = fn(arr) if fn else arr
    for dst, (src_t, fn) in dmap['per_layer'].items():
        stack = []
        for i in range(num_layers):
            arr = _to_numpy(state_dict[src_t.format(i=i)])
            stack.append(fn(arr) if fn else arr)
        flat[f'layers/layer/{dst}'] = np.stack(stack)

    from ..models.dit.dit import rope_head_perm
    qkv_kernel = flat['layers/layer/qkv/base/kernel']   # [L, in, 3C]
    c = qkv_kernel.shape[-1] // 3
    hd = c // num_heads
    perm = rope_head_perm(hd)

    def perm_qk(a, feat_axis):
        shape = a.shape
        a = np.moveaxis(a, feat_axis, -1)
        lead = a.shape[:-1]
        a = a.reshape(lead + (3, num_heads, hd))
        a[..., 0, :, :] = a[..., 0, :, :][..., perm]
        a[..., 1, :, :] = a[..., 1, :, :][..., perm]
        a = a.reshape(lead + (3 * c,))
        return np.moveaxis(a, -1, feat_axis).reshape(shape)

    flat['layers/layer/qkv/base/kernel'] = perm_qk(qkv_kernel.copy(), -1)
    flat['layers/layer/qkv/base/bias'] = perm_qk(
        flat['layers/layer/qkv/base/bias'].copy(), -1)
    for name in ('q_ln_scale', 'q_ln_bias', 'k_ln_scale', 'k_ln_bias'):
        flat[f'layers/layer/{name}'] = \
            flat[f'layers/layer/{name}'][..., perm]
    tree = nest(flat)
    if dtype is not None:
        import jax
        tree = jax.tree.map(lambda a: a.astype(dtype)
                            if 'float' in str(a.dtype) else a, tree)
    return tree
