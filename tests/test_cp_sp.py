"""Context-parallel halo conv/GN and Ulysses SP attention vs single-device
references, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.attention import dot_product_attention
from star_tpu.ops.norms import group_norm
from star_tpu.parallel import make_mesh
from star_tpu.parallel.context_parallel import cp_causal_conv3d, cp_group_norm
from star_tpu.parallel.ulysses import ulysses_attention


def _ref_causal_conv(x, kernel, bias):
    kt, kh, kw = kernel.shape[:3]
    front = jnp.repeat(x[:, :1], kt - 1, axis=1)
    xp = jnp.concatenate([front, x], axis=1)
    out = jax.lax.conv_general_dilated(
        xp, kernel, (1, 1, 1),
        [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return out + bias


def test_cp_causal_conv_matches_single_device(eight_devices):
    mesh = make_mesh(context=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 6, 6, 4))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 5)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(2), (5,)) * 0.1
    ref = _ref_causal_conv(x, kernel, bias)
    with mesh:
        got = cp_causal_conv3d(x, kernel, bias, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_cp_group_norm_matches_global_stats(eight_devices):
    mesh = make_mesh(context=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 4, 4, 32)) * 2 + 1
    scale = jax.random.normal(jax.random.PRNGKey(4), (32,))
    bias = jax.random.normal(jax.random.PRNGKey(5), (32,))
    # reference: GN over the whole video per batch elem (gathered stats)
    ref = group_norm(x.reshape(2, -1, 32), scale, bias, 32,
                     1e-6).reshape(x.shape)
    with mesh:
        got = cp_group_norm(x, scale, bias, mesh, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_ulysses_attention_matches_full(eight_devices):
    mesh = make_mesh(context=4)
    b, s, h, d = 2, 64, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    ref = dot_product_attention(q, k, v)
    with mesh:
        got = ulysses_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ulysses_rejects_indivisible_heads(eight_devices):
    mesh = make_mesh(context=4)
    q = jnp.zeros((1, 8, 6, 4))  # 6 heads not divisible by 4
    with pytest.raises(AssertionError):
        with mesh:
            ulysses_attention(q, q, q, mesh)


def test_dit_ulysses_sp_matches_unsharded(eight_devices):
    """CogVideoDiT with sp_mesh over 'context' == the plain forward — the
    Ulysses opt-in (VERDICT item 7; reference SP consumer:
    opensora/models/layers/blocks.py:345-423)."""
    from star_tpu.models.dit.dit import CogVideoDiT

    kw = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
              latent_channels=4, text_hidden_size=32, text_length=8,
              time_embed_dim=16)
    b, t, h, w = 1, 2, 8, 8      # seq = 8 + 2*4*4 = 40, divisible by 2 and 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 8))
    ti = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 32))

    plain = CogVideoDiT(**kw)
    params = plain.init(jax.random.PRNGKey(2), x, ti, ctx)
    expect = plain.apply(params, x, ti, ctx)

    mesh = make_mesh(context=4)
    sp = CogVideoDiT(**kw, sp_mesh=mesh, sp_axis='context')
    with mesh:
        got = jax.jit(sp.apply)(params, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_ulysses_pads_indivisible_seq(eight_devices):
    """s % axis != 0 pads + masks instead of asserting (round-2 review
    item 8); result equals the unsharded attention on the real rows."""
    mesh = make_mesh(context=4)
    b, s, h, d = 1, 61, 4, 16            # 61 % 4 != 0
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    ref = dot_product_attention(q, k, v)
    with mesh:
        got = jax.jit(lambda q, k, v: ulysses_attention(q, k, v, mesh))(
            q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_dit_sp_indivisible_seq_matches_unsharded(eight_devices):
    """CogVideoDiT under SP with seq % axis != 0 (odd-frame clips at
    context=4): the stream carries masked dead tail rows and the output
    matches the plain forward (round-2 review item 8)."""
    from star_tpu.models.dit.dit import CogVideoDiT

    # seq = 7 + 2*4*4 = 39, not divisible by 4
    kw = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
              latent_channels=4, text_hidden_size=32, text_length=7,
              time_embed_dim=16)
    b, t, h, w = 1, 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(8), (b, t, h, w, 8))
    ti = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(9), (b, 7, 32))

    plain = CogVideoDiT(**kw)
    params = plain.init(jax.random.PRNGKey(10), x, ti, ctx)
    expect = plain.apply(params, x, ti, ctx)

    mesh = make_mesh(context=4)
    sp = CogVideoDiT(**kw, sp_mesh=mesh, sp_axis='context')
    with mesh:
        got = jax.jit(sp.apply)(params, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)
