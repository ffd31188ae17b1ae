"""Flash attention kernel correctness (interpret mode on CPU; the compiled
path is exercised on the real chip by bench.py / verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.flash_attention import _xla_reference, flash_attention


@pytest.mark.parametrize('shape', [
    (2, 100, 100, 4, 64),     # ragged seq < one block
    (1, 300, 77, 2, 64),      # cross-attention-like kv=77
    (1, 513, 513, 1, 128),    # ragged just past a block boundary
    (1, 256, 1024, 2, 64),    # kv exactly block-divisible
])
def test_matches_xla_reference(shape):
    b, sq, skv, h, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, skv, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, skv, h, d), jnp.float32)
    out = flash_attention(q, k, v, None, 256, 256, True)
    ref = _xla_reference(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_custom_scale():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 64, 2, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 64, 2, 64), jnp.float32)
    out = flash_attention(q, k, v, 0.5, 64, 64, True)
    ref = _xla_reference(q, k, v, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 96, 2, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 96, 2, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 96, 2, 64), jnp.float32)
    g1 = jax.grad(lambda *a: flash_attention(*a, None, 64, 64, True).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: _xla_reference(*a, 1 / np.sqrt(64)).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_backward_matches_xla_grads():
    """Pallas recompute backward (dq/dk/dv) == XLA reference grads — the
    round-1 fallback materialized [S,S] logits (VERDICT item 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.ops.flash_attention import _xla_reference, flash_attention

    b, s, h, d = 2, 160, 2, 32
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32) * 0.5
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32) * 0.5
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    ct = jax.random.normal(kg, (b, s, h, d), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 64, 64, True) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, 1.0 / np.sqrt(d)) * ct)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_flash_backward_ragged_seq():
    """Non-divisor sequence (pad rows/cols) still gives exact grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.ops.flash_attention import _xla_reference, flash_attention

    b, s, h, d = 1, 100, 1, 32   # 100 % 64 != 0 -> padded path
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32) * 0.5
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32) * 0.5
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)

    f = lambda q, k, v: jnp.sum(flash_attention(q, k, v, None, 64, 64, True)
                                ** 2)
    r = lambda q, k, v: jnp.sum(_xla_reference(q, k, v, 1 / np.sqrt(d)) ** 2)
    g_flash = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(r, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-3, err_msg=name)
