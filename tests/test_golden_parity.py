"""Numerical parity against golden tensors dumped from the torch reference
(tools/golden_dump.py). Skipped when goldens/ is absent — the reference's
CUDA deps (xformers/fairscale) don't exist in this image, so the dumps are
produced offline and checked in / mounted.

The schedule golden is redundant with the live import test in
test_schedules.py; the UNet golden is the one that needs a torch-capable
host: it freezes random torch weights + inputs + output, and the JAX model
must reproduce the output through the converter."""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), '..', 'goldens')


def _golden(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f'golden {name} not present (generate with '
                    'tools/golden_dump.py on a torch-capable host)')
    return np.load(path)


def test_schedule_golden():
    data = _golden('schedule.npz')
    from star_tpu.diffusion import noise_schedule
    ours = noise_schedule('logsnr_cosine_interp', n=1000,
                          zero_terminal_snr=True, scale_min=2.0,
                          scale_max=4.0)
    np.testing.assert_allclose(ours, data['sigmas'], atol=2e-6)


def test_unet_golden_forward():
    data = _golden('unet_small.npz')
    import json

    import jax.numpy as jnp
    from star_tpu.convert import controlled_unet_name_map, convert_state_dict
    from star_tpu.models.unet.unet import ControlledV2VUNet

    cfg = json.loads(str(data['config_json']))
    sd = {k[4:]: data[k] for k in data.files if k.startswith('sd::')}
    map_cfg = dict(dim=cfg['dim'], dim_mult=tuple(cfg['dim_mult']),
                   num_res_blocks=cfg['num_res_blocks'],
                   attn_scales=tuple(cfg['attn_scales']))
    params = {'params': convert_state_dict(
        sd, controlled_unet_name_map(**map_cfg))}
    model = ControlledV2VUNet(
        dtype=jnp.float32, head_dim=cfg['head_dim'],
        num_heads_init_temporal=cfg['num_heads_init_temporal'],
        context_dim=cfg['context_dim'], **map_cfg)

    # torch layout (b, c, f, h, w) -> ours (b, f, h, w, c)
    to_ours = lambda a: np.transpose(a, (0, 2, 3, 4, 1))
    x = jnp.asarray(to_ours(data['x']))
    hint = jnp.asarray(to_ours(data['hint']))
    out = model.apply(params, x, jnp.asarray(data['t']),
                      jnp.asarray(data['y']), hint)
    expect = to_ours(data['out'])
    np.testing.assert_allclose(np.asarray(out), expect, atol=5e-3)
