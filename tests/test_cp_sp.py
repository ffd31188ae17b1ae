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
