"""Full-size converter dry-run (no weights needed; eval_shape only).

Asset-day insurance: when checkpoints finally appear, conversion must be one
command. This validates — at the REAL model sizes — that every name-map
destination exists in the full-size init tree and that the init tree is
fully covered by the maps (the tiny-config tests in
tests/test_tower_converters.py prove the same property structurally; 42-layer
/ 4-level naming only materializes here).

    python tools/convert_dryrun.py [--which unet vae clip t5 dit causal_vae]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        p = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def check(name, init_tree, dst_keys):
    flat = _flatten(init_tree['params'])
    missing_in_tree = sorted(set(dst_keys) - set(flat))
    uncovered = sorted(set(flat) - set(dst_keys))
    ok = not missing_in_tree and not uncovered
    print(f'{name}: {len(flat)} init leaves, {len(dst_keys)} map entries '
          f'-> {"OK" if ok else "MISMATCH"}')
    for m in missing_in_tree[:10]:
        print(f'  map dst not in init tree: {m}')
    for m in uncovered[:10]:
        print(f'  init leaf not covered:    {m}')
    return ok


def dry_unet():
    import jax
    import jax.numpy as jnp
    from star_tpu.convert.unet_map import controlled_unet_name_map
    from star_tpu.models.unet.unet import ControlledV2VUNet
    m = ControlledV2VUNet(dtype=jnp.bfloat16)
    init = jax.eval_shape(
        m.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 18, 16, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 1024), jnp.bfloat16),
        jnp.zeros((1, 2, 18, 16, 4), jnp.bfloat16))
    return check('unet (light_deg/heavy_deg)', init,
                 list(controlled_unet_name_map()))


def dry_vae():
    import jax
    import jax.numpy as jnp
    from star_tpu.convert.tower_maps import svd_vae_name_map
    from star_tpu.vae.svd_vae import SVDTemporalVAE
    m = SVDTemporalVAE(dtype=jnp.bfloat16)
    init = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 2, 32, 32, 3), jnp.bfloat16))
    return check('svd_vae', init, list(svd_vae_name_map()))


def dry_clip():
    import jax
    import jax.numpy as jnp
    from star_tpu.convert.tower_maps import clip_text_name_map
    from star_tpu.models.clip.text import CLIPTextEncoder
    m = CLIPTextEncoder(dtype=jnp.bfloat16)   # ViT-H text defaults
    init = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 77), jnp.int32))
    return check('clip (ViT-H text)', init, list(clip_text_name_map()))


def dry_t5():
    import jax
    import jax.numpy as jnp
    from star_tpu.convert.tower_maps import t5_encoder_name_map
    from star_tpu.models.t5.encoder import T5Encoder
    m = T5Encoder(dtype=jnp.bfloat16)         # T5-XXL defaults
    init = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 226), jnp.int32))
    return check('t5 (XXL encoder)',
                 init, list(t5_encoder_name_map(num_layers=m.num_layers)))


def dry_dit():
    """convert_dit stacks per-layer entries itself; validate coverage by
    converting a synthesized zero state-dict of the mapped shapes at
    hidden=3072/42L via the map-inversion the converter defines."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.convert.tower_maps import dit_name_map
    from star_tpu.models.dit.dit import CogVideoDiT
    m = CogVideoDiT(dtype=jnp.bfloat16)
    init = jax.eval_shape(
        m.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 60, 90, 32), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 226, 4096), jnp.bfloat16))
    nm = dit_name_map(num_layers=42)
    # dit_name_map is {'per_layer': {...'{i}' templates...}, 'top': {...},
    # 'num_layers': N}; the scan layout stacks per-layer dsts under
    # layers/layer/ (convert_dit does the stacking)
    dsts = list(nm['top']) + [f'layers/layer/{k}' for k in nm['per_layer']]
    return check('dit (CogVideoX-5B SR)', init, dsts)


def dry_causal_vae():
    import jax
    import jax.numpy as jnp
    from star_tpu.convert.causal_vae_map import causal_vae_name_map
    from star_tpu.vae.causal_vae import CogVideoVAE
    m = CogVideoVAE(dtype=jnp.bfloat16)
    init = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 64, 64, 3), jnp.bfloat16))
    return check('causal_vae (CogVideoX 3D)', init,
                 list(causal_vae_name_map()))


ALL = {'unet': dry_unet, 'vae': dry_vae, 'clip': dry_clip, 't5': dry_t5,
       'dit': dry_dit, 'causal_vae': dry_causal_vae}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--which', nargs='*', default=list(ALL))
    args = ap.parse_args()
    import jax
    jax.config.update('jax_platforms', 'cpu')   # eval_shape only; no TPU
    ok = True
    for name in args.which:
        ok &= ALL[name]()
    print('convert_dryrun:', 'ALL OK' if ok else 'MISMATCHES FOUND')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
