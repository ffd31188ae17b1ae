"""SVD temporal VAE structure tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.vae.svd_vae import SVDTemporalVAE, Encoder, TemporalDecoder


class TinyVAE(SVDTemporalVAE):
    def setup(self):
        self.encoder = Encoder(block_out_channels=(32, 32, 64, 64),
                               dtype=self.dtype, name='encoder')
        self.decoder = TemporalDecoder(block_out_channels=(32, 32, 64, 64),
                                       layers_per_block=1,
                                       dtype=self.dtype, name='decoder')


@pytest.fixture(scope='module')
def vae():
    m = TinyVAE()
    video = jnp.zeros((1, 3, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), video)
    return m, params


def test_encode_shape_is_8x_downsampled(vae):
    m, params = vae
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 32, 40, 3))
    z = m.apply(params, video, method=TinyVAE.encode)
    assert z.shape == (1, 6, 4, 5, 4)


def test_decode_shape_is_8x_upsampled(vae):
    m, params = vae
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 4, 5, 4)) * 0.2
    video = m.apply(params, z, method=TinyVAE.decode)
    assert video.shape == (1, 6, 32, 40, 3)


def test_decode_windows_are_independent(vae):
    """3-frame decode windows are independent (zero temporal pad at edges,
    like the reference's serial chunked decode) — changing frames in window 2
    must not affect window 1's output."""
    m, params = vae
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 4, 4, 4)) * 0.2
    out1 = m.apply(params, z, method=TinyVAE.decode)
    z2 = z.at[:, 3:].set(z[:, 3:] + 1.0)
    out2 = m.apply(params, z2, method=TinyVAE.decode)
    np.testing.assert_allclose(np.asarray(out1[:, :3]),
                               np.asarray(out2[:, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(out1[:, 3:]), np.asarray(out2[:, 3:]))


def test_decode_ragged_tail(vae):
    m, params = vae
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 4, 4, 4)) * 0.2
    video = m.apply(params, z, method=TinyVAE.decode)
    assert video.shape[1] == 7


def test_encode_stochastic_vs_mean(vae):
    m, params = vae
    video = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 32, 32, 3))
    z_mean = m.apply(params, video, method=TinyVAE.encode)
    z_s1 = m.apply(params, video, jax.random.PRNGKey(6), method=TinyVAE.encode)
    z_s2 = m.apply(params, video, jax.random.PRNGKey(6), method=TinyVAE.encode)
    np.testing.assert_allclose(np.asarray(z_s1), np.asarray(z_s2))
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_s1))


def test_roundtrip_preserves_shape(vae):
    m, params = vae
    video = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 32, 32, 3))
    out = m.apply(params, video)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()


def test_temporal_conv3_matches_native_conv():
    """Both gemm/conv spellings of the 3-tap temporal conv agree with
    lax.conv for any activation size (the op auto-selects by size)."""
    import jax.numpy as jnp
    from star_tpu.ops.temporal_conv import temporal_conv3

    key = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(key[0], (2, 5, 48, 16), jnp.float32)
    kern = jax.random.normal(key[1], (3, 1, 16, 24), jnp.float32) * 0.1
    bias = jax.random.normal(key[2], (24,), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = temporal_conv3(x, kern, bias)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref + bias), rtol=2e-5, atol=2e-5)
