"""Fused temporal (frame-axis) attention kernel correctness — interpret mode
on CPU; the compiled path is exercised on the real chip by bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.temporal_attention import (_pick_nblock, _xla_reference,
                                             temporal_attention)


@pytest.mark.parametrize('shape,heads', [
    ((2, 8, 256, 128), 2),    # even heads, one head pair
    ((1, 8, 512, 320), 5),    # the UNet stage-0 config: odd heads, 64 tail
    ((1, 4, 128, 64), 1),     # single head
    ((2, 7, 200, 192), 3),    # odd frames, n needing a small block
])
def test_matches_xla_reference(shape, heads):
    b, f, n, hd = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, f, n, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, f, n, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, f, n, hd), jnp.float32)
    out = temporal_attention(q, k, v, heads, None, None, True)
    ref = _xla_reference(q, k, v, 1.0 / np.sqrt(hd // heads), heads,
                         hd // heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_close():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 8, 256, 128), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 8, 256, 128), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 8, 256, 128), jnp.bfloat16)
    out = temporal_attention(q, k, v, 2, None, None, True)
    ref = _xla_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), 1.0 / 8.0, 2, 64)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2)


def test_gradients_match():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 4, 128, 128), jnp.float32)
    k = jax.random.normal(ks[1], (1, 4, 128, 128), jnp.float32)
    v = jax.random.normal(ks[2], (1, 4, 128, 128), jnp.float32)

    def loss_kernel(q, k, v):
        return temporal_attention(q, k, v, 2, None, None, True).sum()

    def loss_ref(q, k, v):
        return _xla_reference(q, k, v, 1.0 / 8.0, 2, 64).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fallback_shapes_use_xla():
    # d != 64 or indivisible n must route through the XLA reference
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (1, 8, 130, 96), jnp.float32)  # d=48, n=130
    k = jax.random.normal(ks[1], (1, 8, 130, 96), jnp.float32)
    v = jax.random.normal(ks[2], (1, 8, 130, 96), jnp.float32)
    out = temporal_attention(q, k, v, 2, None, None, True)
    ref = _xla_reference(q, k, v, 1.0 / np.sqrt(48), 2, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pick_nblock():
    assert _pick_nblock(14400) == 120      # 120 | 14400, multiple of 8
    assert 14400 % _pick_nblock(14400) == 0
    assert _pick_nblock(3680) is not None and 3680 % _pick_nblock(3680) == 0
    assert _pick_nblock(960) is not None and 960 % _pick_nblock(960) == 0
    assert _pick_nblock(17) is None
