"""Fused GN+SiLU+temporal-conv kernel (ops/fused_temporal_conv.py):
interpret-mode Pallas vs the jnp reference chain, stats threading, residual
fold, and the recompute VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.conv3x3 import channel_stats, gn_coeffs
from star_tpu.ops.fused_temporal_conv import (_pick_nb, _tconv_xla,
                                              fused_gn_silu_tconv3)

pytestmark = pytest.mark.quick


def _inputs(key, b, f, n, c, cout, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[1], (b, f, n, c), dtype)
    sc = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1 + 1.0
    bi = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
    kern = jax.random.normal(ks[4], (3, 1, c, cout), jnp.float32) * 0.05
    cb = jax.random.normal(ks[5], (cout,), jnp.float32) * 0.1
    return x, sc, bi, kern, cb


@pytest.mark.parametrize('shape,res', [((2, 8, 160, 64), False),
                                       ((2, 5, 96, 64), True),
                                       ((1, 3, 64, 128), False)])
def test_interpret_matches_reference(shape, res):
    b, f, n, c = shape
    x, sc, bi, kern, cb = _inputs(jax.random.PRNGKey(0), b, f, n, c, c)
    r = (jax.random.normal(jax.random.PRNGKey(9), (b, f, n, c))
         if res else None)
    y1, st1 = fused_gn_silu_tconv3(x, sc, bi, kern, cb, residual=r,
                                   want_stats=True, interpret=True)
    st = channel_stats(x.reshape(b, f * n, c))
    a, bb = gn_coeffs(st, f * n * (c // 32), sc, bi, 32, 1e-5)
    y2, st2 = _tconv_xla(x, a, bb, kern[:, 0], cb, r, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st1[0]), np.asarray(st2[0]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st1[1]), np.asarray(st2[1]),
                               rtol=1e-4, atol=1e-3)


def test_stats_threading_chain():
    """Chained stats must equal freshly-computed stats at every stage."""
    b, f, n, c = 1, 4, 64, 64
    x, sc, bi, kern, cb = _inputs(jax.random.PRNGKey(1), b, f, n, c, c)
    # threaded
    y, st = fused_gn_silu_tconv3(x, sc, bi, kern, cb, want_stats=True)
    y2, _ = fused_gn_silu_tconv3(y, sc, bi, kern, cb, stats=st, residual=x)
    # unthreaded
    z, _ = fused_gn_silu_tconv3(x, sc, bi, kern, cb)
    z2, _ = fused_gn_silu_tconv3(z, sc, bi, kern, cb, residual=x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(z2), atol=1e-5)


def test_vjp_matches_reference_autodiff():
    """The custom VJP must equal plain autodiff through the reference chain
    (it IS a recompute of that vjp — exact wiring check, no fd noise)."""
    from star_tpu.ops.fused_temporal_conv import _reference
    b, f, n, c = 1, 4, 32, 64
    x, sc, bi, kern, cb = _inputs(jax.random.PRNGKey(2), b, f, n, c, c)

    def loss_fused(x, sc, bi, kern, cb):
        y, st = fused_gn_silu_tconv3(x, sc, bi, kern, cb, want_stats=True)
        y2, _ = fused_gn_silu_tconv3(y, sc, bi, kern, cb, stats=st,
                                     residual=x)
        return jnp.sum(y2 * y2)

    def loss_ref(x, sc, bi, kern, cb):
        y, st = _reference(x, sc, bi, kern, cb, None, None, 32, 1e-5, True)
        y2, _ = _reference(y, sc, bi, kern, cb, st, x, 32, 1e-5, False)
        return jnp.sum(y2 * y2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 3))(x, sc, bi, kern, cb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3))(x, sc, bi, kern, cb)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                                   atol=1e-5)


@pytest.mark.parametrize('interpret', [True, False])
def test_stats_per_frame(interpret):
    """stats_per_frame=True must emit per-(batch,frame) [B*F, C] sums that
    match channel_stats on the per-frame reshape of the output (both the
    Pallas kernel in interpret mode and the jnp fallback)."""
    b, f, n, c = 2, 3, 64, 64
    x, sc, bi, kern, cb = _inputs(jax.random.PRNGKey(3), b, f, n, c, c)
    y, st = fused_gn_silu_tconv3(x, sc, bi, kern, cb, residual=x,
                                 want_stats=True, stats_per_frame=True,
                                 interpret=interpret)
    s_ref, s2_ref = channel_stats(y.reshape(b * f, n, c))
    assert st[0].shape == (b * f, c)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[1]), np.asarray(s2_ref),
                               rtol=1e-4, atol=1e-3)


def test_alpha_blend_fold_equivalence():
    """TemporalResnetBlock's alpha fold must equal the explicit blend:
    (1-a)*x + a*(tblock(x))  ==  x + a*conv2_out  (shortcut == input)."""
    from star_tpu.vae.svd_vae import TemporalResnetBlock
    b, f, hh, ww, c = 1, 3, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(4), (b, f, hh, ww, c))
    blk = TemporalResnetBlock(c)
    params = blk.init(jax.random.PRNGKey(5), x)
    # perturb params away from flax zero-init biases
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.arange(p.size, dtype=p.dtype
                                        ).reshape(p.shape) / p.size, params)
    alpha = jnp.float32(0.37)
    h_tm, _ = blk.apply(params, x)                       # plain block
    expected = (1 - alpha) * x + alpha * h_tm
    folded, st = blk.apply(params, x, alpha=alpha, want_stats=True)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
    s_ref, _ = channel_stats(folded.reshape(b * f, hh * ww, c))
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)


def test_nb_picker_fallback_shapes():
    # N % 8 != 0 (the UNet's deepest 13x20 grid) must not pick a kernel path
    assert _pick_nb(260, 8, 1280, 1280, False) is None or 260 % 8 != 0
    # deployment scales pick something
    for n, c in [(14400, 320), (3680, 640), (960, 1280)]:
        assert _pick_nb(n, 8, c, c, True) is not None
