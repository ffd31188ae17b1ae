"""Checkpoint conversion CLI (runs where the torch checkpoints live).

    python -m star_tpu.convert.cli unet light_deg.pt out/unet
    python -m star_tpu.convert.cli vae  svd_vae_state_dict.bin out/vae
    python -m star_tpu.convert.cli clip open_clip_pytorch_model.bin out/clip
    python -m star_tpu.convert.cli t5   t5_xxl_state_dict.bin out/t5
    python -m star_tpu.convert.cli dit  cog_transformer.pt out/dit --merge-lora
    python -m star_tpu.convert.cli causal_vae 3d-vae.pt out/causal_vae
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser


def main():
    p = ArgumentParser()
    p.add_argument('kind', choices=('unet', 'vae', 'clip', 't5', 'dit',
                                    'causal_vae'))
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--merge-lora', action='store_true')
    p.add_argument('--num-layers', type=int, default=None)
    args = p.parse_args()

    import torch

    from .convert import convert_state_dict, save_params
    from .tower_maps import (clip_text_name_map, convert_dit, merge_sat_lora,
                             svd_vae_name_map, t5_encoder_name_map)
    from .unet_map import controlled_unet_name_map

    sd = torch.load(args.src, map_location='cpu', weights_only=False)
    for key in ('state_dict', 'module', 'model'):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]

    if args.kind == 'unet':
        tree = convert_state_dict(sd, controlled_unet_name_map())
    elif args.kind == 'vae':
        tree = convert_state_dict(sd, svd_vae_name_map())
    elif args.kind == 'clip':
        layers = args.num_layers or 24
        tree = convert_state_dict(sd, clip_text_name_map(layers=layers))
    elif args.kind == 't5':
        layers = args.num_layers or 24
        tree = convert_state_dict(sd, t5_encoder_name_map(num_layers=layers))
    elif args.kind == 'dit':
        if args.merge_lora:
            sd = merge_sat_lora(sd)
        tree = convert_dit(sd, num_layers=args.num_layers or 42)
    else:
        from .causal_vae_map import causal_vae_name_map
        tree = convert_state_dict(sd, causal_vae_name_map())

    save_params(args.dst, tree)
    n = sum(v.size for v in _leaves(tree))
    print(f'converted {args.kind}: {n/1e6:.1f}M params -> {args.dst}')


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


if __name__ == '__main__':
    main()
