"""Map-completeness tests for CLIP / SVD-VAE / T5 / DiT converters
(same strategy as test_convert.py: invert layouts to synthesize a
torch-shaped state dict, convert, compare against model.init)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.convert import convert_state_dict, verify_against_init, layout
from star_tpu.convert.tower_maps import (clip_text_name_map, convert_dit,
                                         dit_name_map, merge_sat_lora,
                                         svd_vae_name_map,
                                         t5_encoder_name_map)
from star_tpu.models.clip.text import CLIPTextEncoder
from star_tpu.models.dit.dit import CogVideoDiT
from star_tpu.models.t5.encoder import T5Encoder
from star_tpu.vae.svd_vae import SVDTemporalVAE


def _flatten(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        p = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _invert(fn, shape):
    if fn is None:
        return shape
    if fn is layout.linear_kernel:
        i, o = shape
        return (o, i)
    if fn is layout.conv2d_kernel:
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if fn is layout.conv3d_t11_kernel:
        kt, kw, i, o = shape
        return (o, i, kt, 1, 1)
    if fn is layout.conv1d_as_dense:
        i, o = shape
        return (o, i, 1)
    # callable lambdas (e.g. mix_factor reshape): torch side is scalar-like
    return ()


def _check_map(model, init_args, name_map):
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    flat_init = _flatten(init['params'])
    sd = {}
    for dst, (src, fn) in name_map.items():
        assert dst in flat_init, f'{dst} not in init tree'
        sd[src] = np.zeros(_invert(fn, tuple(flat_init[dst].shape)),
                           np.float32)
    missing = sorted(set(flat_init) - set(name_map))
    assert not missing, missing[:8]
    converted = convert_state_dict(sd, name_map)
    assert not verify_against_init(converted, init)


def test_clip_map_complete():
    model = CLIPTextEncoder(vocab_size=100, width=32, heads=2, layers=3)
    _check_map(model, (jnp.zeros((1, 77), jnp.int32),),
               clip_text_name_map(layers=3))


def test_svd_vae_map_complete():
    model = SVDTemporalVAE()
    # use the real channel config but eval_shape only (no memory cost)
    _check_map(model, (jnp.zeros((1, 2, 32, 32, 3)),), svd_vae_name_map())


def test_t5_map_complete():
    model = T5Encoder(vocab_size=128, d_model=32, d_ff=64, num_heads=4,
                      num_layers=3)
    _check_map(model, (jnp.zeros((1, 16), jnp.int32),),
               t5_encoder_name_map(num_layers=3))


def test_dit_converter_stacks_layers():
    nl = 2
    model = CogVideoDiT(hidden_size=64, num_layers=nl, num_heads=4,
                        patch_size=2, latent_channels=4, text_hidden_size=32,
                        text_length=8, time_embed_dim=16)
    x = jnp.zeros((1, 2, 8, 8, 8))
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0), x,
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 32)))
    flat_init = _flatten(init['params'])

    dmap = dit_name_map(nl)
    sd = {}
    for dst, (src, fn) in dmap['top'].items():
        sh = tuple(flat_init[dst].shape)
        sd[src] = np.zeros(_invert(fn, sh), np.float32)
    for dst, (src_t, fn) in dmap['per_layer'].items():
        stacked_shape = tuple(flat_init[f'layers/layer/{dst}'].shape)
        per = stacked_shape[1:]
        for i in range(nl):
            sd[src_t.format(i=i)] = np.full(_invert(fn, per), float(i),
                                            np.float32)
    tree = convert_dit(sd, num_layers=nl, num_heads=4)
    problems = verify_against_init(tree, init)
    assert not problems, problems[:8]
    # per-layer values land on the right slice of the stacked axis
    lnk = tree['layers']['layer']['input_ln_scale']
    assert lnk[0].mean() == 0.0 and lnk[1].mean() == 1.0


def test_merge_sat_lora():
    torch = pytest.importorskip('torch')
    w = torch.zeros(6, 4)
    a = torch.ones(2, 4) * 0.5     # [r, in]
    b = torch.ones(6, 2)           # [out, r]
    sd = {'transformer.layers.0.attention.query_key_value.weight': w,
          'transformer.layers.0.attention.query_key_value.matrix_A': a,
          'transformer.layers.0.attention.query_key_value.matrix_B': b}
    merged = merge_sat_lora(sd)
    assert 'transformer.layers.0.attention.query_key_value.matrix_A' not in merged
    got = merged['transformer.layers.0.attention.query_key_value.weight']
    np.testing.assert_allclose(got.numpy(), np.full((6, 4), 1.0))


def test_causal_vae_map_complete():
    from star_tpu.convert.causal_vae_map import causal_vae_name_map, conv3d_kernel
    from star_tpu.vae.causal_vae import CogVideoVAE
    model = CogVideoVAE()
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 32, 32, 3)))
    flat_init = _flatten(init['params'])
    name_map = causal_vae_name_map()
    sd = {}
    for dst, (src, fn) in name_map.items():
        sh = tuple(flat_init[dst].shape)
        if fn is conv3d_kernel:
            kt, kh, kw, i, o = sh
            tshape = (o, i, kt, kh, kw)
        else:
            tshape = _invert(fn, sh)
        assert dst in flat_init, dst
        sd[src] = np.zeros(tshape, np.float32)
    missing = sorted(set(flat_init) - set(name_map))
    assert not missing, missing[:8]
    converted = convert_state_dict(sd, name_map)
    assert not verify_against_init(converted, init)
