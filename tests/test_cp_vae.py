"""Context-parallel causal VAE == single-device causal VAE, end to end on the
8-virtual-device CPU mesh (context=4). Reference behavior:
cp_enc_dec.py:76-441 (CP split/halo/gathered-GN execution of
ContextParallelEncoder3D/Decoder3D)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.parallel import make_mesh
from star_tpu.vae.causal_vae import (CausalDecoder3D, CausalEncoder3D,
                                     cp_decode, cp_encode)

CFG = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
           temporal_compress_level=1)


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(context=4)


def test_cp_encode_matches_serial(mesh):
    # T = 1 + P*k with k=8 (so the deepest temporal level still has k=4 >= 2)
    enc_kw = {k: v for k, v in CFG.items() if k != 'out_ch'}
    enc = CausalEncoder3D(**enc_kw)
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (1, 33, 16, 16, 3), jnp.float32)
    params = enc.init(key, video)['params']

    serial = enc.apply({'params': params}, video)
    cp = cp_encode(params, video, mesh, **enc_kw)
    assert cp.shape == serial.shape
    np.testing.assert_allclose(np.asarray(cp), np.asarray(serial),
                               atol=2e-5, rtol=1e-5)


def test_cp_decode_matches_serial(mesh):
    dec = CausalDecoder3D(**CFG)
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (1, 9, 4, 4, CFG['z_channels']), jnp.float32)
    params = dec.init(key, z)['params']

    serial = dec.apply({'params': params}, z)
    cp = cp_decode(params, z, mesh, **CFG)
    assert cp.shape == serial.shape
    np.testing.assert_allclose(np.asarray(cp), np.asarray(serial),
                               atol=2e-5, rtol=1e-5)
