"""CogVideoX causal 3D VAE tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.vae.causal_vae import (CausalDecoder3D, CausalEncoder3D,
                                     CogVideoVAE)


class TinyVAE(CogVideoVAE):
    def setup(self):
        self.encoder = CausalEncoder3D(ch=32, ch_mult=(1, 1, 1, 1),
                                       num_res_blocks=1, z_channels=4,
                                       name='encoder')
        self.decoder = CausalDecoder3D(ch=32, ch_mult=(1, 1, 1, 1),
                                       num_res_blocks=1, z_channels=4,
                                       name='decoder')


@pytest.fixture(scope='module')
def vae():
    m = TinyVAE()
    video = jnp.zeros((1, 5, 16, 16, 3))
    variables = m.init(jax.random.PRNGKey(0), video)
    return m, variables


def test_temporal_compression_4x_plus_one(vae):
    """(4k+1) frames -> k+1 latent frames (data_video.py frames=4k+1 rule)."""
    m, v = vae
    for t_in, t_lat in ((9, 3), (5, 2), (1, 1), (25, 7)):
        video = jax.random.normal(jax.random.PRNGKey(1), (1, t_in, 16, 16, 3))
        z = m.apply(v, video, method=TinyVAE.encode)
        assert z.shape == (1, t_lat, 2, 2, 4), (t_in, z.shape)


def test_decode_inverts_time_compression(vae):
    m, v = vae
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 2, 2, 4)) * 0.3
    out = m.apply(v, z, method=TinyVAE.decode)
    assert out.shape == (1, 9, 16, 16, 3)


def test_causal_conv_is_causal():
    """The causal conv itself: later frames cannot affect earlier outputs.
    (The full encoder is NOT strictly causal — its gathered GroupNorm couples
    all frames by design, cp_enc_dec.py gather_norm=True.)"""
    from star_tpu.vae.causal_vae import CausalConv3d
    conv = CausalConv3d(8, (3, 3, 3))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 8, 8, 4))
    p = conv.init(jax.random.PRNGKey(4), x)
    y1 = conv.apply(p, x)
    x2 = x.at[:, 3:].set(x[:, 3:] + 1.0)
    y2 = conv.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :3]), np.asarray(y2[:, :3]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(y1[:, 3:]), np.asarray(y2[:, 3:]))


def test_causal_conv_first_frame_replicate_pad():
    """Front padding replicates frame 0 (cp_enc_dec.py:278-282): a constant
    video stays constant in time through the conv."""
    from star_tpu.vae.causal_vae import CausalConv3d
    conv = CausalConv3d(4, (3, 1, 1))
    x = jnp.ones((1, 5, 2, 2, 4))
    p = conv.init(jax.random.PRNGKey(5), x)
    y = conv.apply(p, x)
    for i in range(1, 5):
        np.testing.assert_allclose(np.asarray(y[:, i]), np.asarray(y[:, 0]),
                                   atol=1e-6)


def test_chunked_decode_with_cache(vae):
    """Reference decode windowing (sample_sr.py:213-228): first window
    latents[0:3] (-> 9 frames), then [2i+1:2i+3] (-> 8 frames each), causal
    state carried via the 'cache' collection between calls."""
    m, v = vae
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 2, 2, 4)) * 0.3

    full = m.apply(v, z, method=TinyVAE.decode)
    assert full.shape[1] == 17          # 1 + 4*4

    out1, mut = m.apply(v, z[:, 0:3], True, True, method=TinyVAE.decode,
                        mutable=['cache'])
    out2, _ = m.apply({**v, **mut}, z[:, 3:5], True, False,
                      method=TinyVAE.decode, mutable=['cache'])
    assert out1.shape[1] == 9 and out2.shape[1] == 8

    # chunk 1 standalone == chunk 1 with cache enabled (nothing to consume)
    alone = m.apply(v, z[:, 0:3], method=TinyVAE.decode)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(alone), atol=1e-5)
    # chunk 2 must consume the carried cache -> differs from standalone
    alone2 = m.apply(v, z[:, 3:5], method=TinyVAE.decode)
    assert not np.allclose(np.asarray(out2), np.asarray(alone2))
