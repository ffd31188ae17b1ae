"""Fused GN+SiLU+conv3x3 kernel and 2x2 interleave: interpret-mode parity
with the jnp fallback, semantic parity with the unfused GroupNorm spelling,
and the VAE block param-tree contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.conv3x3 import (_conv3x3_pallas, _conv3x3_xla, _pick_hb,
                                  channel_stats, fused_gn_silu_conv3x3,
                                  gn_coeffs, interleave2x2)
from star_tpu.ops.norms import group_norm


def _setup(n=2, h=12, w=16, c=128, cout=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, c, cout), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    gs = 1.0 + 0.1 * jax.random.normal(ks[3], (c,), jnp.float32)
    gb = 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
    res = jax.random.normal(ks[5], (n, h, w, cout), jnp.float32)
    return x, k, bias, gs, gb, res


@pytest.mark.parametrize('with_res', [False, True])
def test_kernel_matches_fallback(with_res):
    x, k, bias, gs, gb, res = _setup()
    n, h, w, c = x.shape
    a, b = gn_coeffs(channel_stats(x), h * w * (c // 32), gs, gb, 32, 1e-6)
    r = res if with_res else None
    y_ref, st_ref = _conv3x3_xla(x, a, b, k, bias, r, True)
    hb = _pick_hb(h, w, c, k.shape[-1])
    y_k, st_k = _conv3x3_pallas(x, a, b, k, bias, r, True, hb, True)
    np.testing.assert_allclose(y_k, y_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(st_k[0], st_ref[0], atol=2e-3)
    np.testing.assert_allclose(st_k[1], st_ref[1], atol=2e-3)


def test_matches_unfused_groupnorm_spelling():
    """fused_gn_silu_conv3x3 == GroupNorm -> SiLU -> conv -> +res (the
    pre-r3 svd_vae block spelling, ops/norms.group_norm semantics)."""
    x, k, bias, gs, gb, res = _setup(c=64, cout=64)
    y = group_norm(x, gs, gb, 32, 1e-6)
    y = jax.nn.silu(y)
    ref = jax.lax.conv_general_dilated(
        y, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32) + bias + res
    got, stats = fused_gn_silu_conv3x3(x, gs, gb, k, bias, residual=res,
                                       want_stats=True)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    s, s2 = channel_stats(got)
    np.testing.assert_allclose(stats[0], s, atol=1e-3)
    np.testing.assert_allclose(stats[1], s2, atol=1e-3)


def test_stats_threading_equivalence():
    """Passing the producer's stats gives the same result as recomputing."""
    x, k, bias, gs, gb, _ = _setup(c=64, cout=64)
    y0, st = fused_gn_silu_conv3x3(x, gs, gb, k, bias, want_stats=True)
    y1, _ = fused_gn_silu_conv3x3(y0, gs, gb, k, bias, stats=st)
    y2, _ = fused_gn_silu_conv3x3(y0, gs, gb, k, bias)
    np.testing.assert_allclose(y1, y2, atol=1e-5, rtol=1e-5)


def test_interleave2x2():
    n, h, w, c = 2, 6, 16, 128
    ps = [jax.random.normal(jax.random.PRNGKey(i), (n, h, w, c), jnp.float32)
          for i in range(4)]
    ref = jnp.stack([jnp.stack([ps[0], ps[1]], axis=3),
                     jnp.stack([ps[2], ps[3]], axis=3)],
                    axis=2).reshape(n, 2 * h, 2 * w, c)
    got = interleave2x2(*ps, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vae_block_param_tree_unchanged():
    """ResnetBlock2D keeps nn.GroupNorm/nn.Conv param names and shapes
    (converter/checkpoint contract)."""
    from star_tpu.vae.svd_vae import ResnetBlock2D
    blk = ResnetBlock2D(128)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64)))
    p = v['params']
    assert set(p) == {'norm1', 'norm2', 'conv1', 'conv2', 'conv_shortcut'}
    assert p['norm1']['scale'].shape == (64,)
    assert p['conv1']['kernel'].shape == (3, 3, 64, 128)
    assert p['conv2']['bias'].shape == (128,)
    out, stats = blk.apply(v, jnp.ones((1, 8, 8, 64)), want_stats=True)
    assert out.shape == (1, 8, 8, 128)
    assert stats[0].shape == (1, 128)


def test_upsample_conv2x_fused():
    """One-kernel phase upsample == nearest-2x + 3x3 SAME conv."""
    from star_tpu.ops.conv3x3 import upsample_conv2x_fused
    from star_tpu.ops.upsample_conv import _M
    n, h, w, c = 2, 12, 16, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                          jnp.float32) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32) * 0.1
    ms = [jnp.asarray(m, jnp.float32) for m in _M]
    krs = jnp.stack([jnp.einsum('ap,bq,abio->pqio', ms[r], ms[s], k)
                     for r in (0, 1) for s in (0, 1)])
    got, stats = upsample_conv2x_fused(x, krs, b, want_stats=True,
                                       interpret=True)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = jax.lax.conv_general_dilated(
        up, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    s, s2 = channel_stats(ref)
    np.testing.assert_allclose(stats[0], s, atol=2e-3)
    np.testing.assert_allclose(stats[1], s2, atol=2e-3)


@pytest.mark.parametrize('with_res', [False, True])
def test_winograd_matches_fallback(with_res):
    """F(2x2,3x3) kernel == the direct XLA fallback (fp32, interpret)."""
    from star_tpu.ops.conv3x3 import _conv3x3_wino_pallas, _pick_hb_wino
    x, k, bias, gs, gb, res = _setup(h=12, w=16)
    n, h, w, c = x.shape
    a, b = gn_coeffs(channel_stats(x), h * w * (c // 32), gs, gb, 32, 1e-6)
    r = res if with_res else None
    y_ref, st_ref = _conv3x3_xla(x, a, b, k, bias, r, True)
    hb = _pick_hb_wino(h, w, c, k.shape[-1])
    assert hb is not None
    y_k, st_k = _conv3x3_wino_pallas(x, a, b, k, bias, r, True, hb, True)
    np.testing.assert_allclose(y_k, y_ref, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(st_k[0], st_ref[0], atol=2e-2)
    np.testing.assert_allclose(st_k[1], st_ref[1], atol=2e-2)


def test_winograd_single_block():
    """nh == 1 variant (whole image in one block) and cout != c."""
    from star_tpu.ops.conv3x3 import _conv3x3_wino_pallas, _pick_hb_wino
    x, k, bias, gs, gb, _ = _setup(n=1, h=4, w=8, c=128, cout=256, seed=3)
    n, h, w, c = x.shape
    a, b = gn_coeffs(channel_stats(x), h * w * (c // 32), gs, gb, 32, 1e-6)
    y_ref, _ = _conv3x3_xla(x, a, b, k, bias, None, False)
    hb = _pick_hb_wino(h, w, c, k.shape[-1])
    y_k, _ = _conv3x3_wino_pallas(x, a, b, k, bias, None, False, hb, True)
    np.testing.assert_allclose(y_k, y_ref, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize('h,m_want', [(12, 4), (10, 2)])
def test_winograd_h_matches_fallback(h, m_want):
    """1-D H-Winograd (F(4,3)/F(2,3)) == direct XLA fallback."""
    from star_tpu.ops.conv3x3 import _conv3x3_winoh_pallas, _pick_hb_winoh
    x, k, bias, gs, gb, res = _setup(h=h, w=16)
    n, _, w, c = x.shape
    a, b = gn_coeffs(channel_stats(x), h * w * (c // 32), gs, gb, 32, 1e-6)
    y_ref, st_ref = _conv3x3_xla(x, a, b, k, bias, res, True)
    pick = _pick_hb_winoh(h, w, c, k.shape[-1])
    assert pick is not None and pick[1] == m_want
    y_k, st_k = _conv3x3_winoh_pallas(x, a, b, k, bias, res, True,
                                      pick[0], pick[1], True)
    np.testing.assert_allclose(y_k, y_ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(st_k[0], st_ref[0], atol=5e-2)
    np.testing.assert_allclose(st_k[1], st_ref[1], atol=5e-2)
