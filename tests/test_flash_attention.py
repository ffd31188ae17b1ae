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


@pytest.mark.parametrize('shape,kv_valid', [
    ((1, 256, 256, 4, 64), None),      # 2 head-pairs, divisible
    ((2, 200, 200, 2, 64), None),      # ragged seq -> padded blocks
    ((1, 256, 256, 2, 128), None),     # d=128: one head per lane block
    ((1, 260, 260, 4, 64), 252),       # dead kv tail (CogVideoX 9676->9680)
    ((1, 256, 256, 5, 64), None),      # odd heads -> whole-row lane blocks
    ((2, 208, 208, 3, 64), 200),       # odd heads + ragged + dead tail
])
def test_packed_matches_xla_reference(shape, kv_valid):
    """Natural-layout [B,S,H*D] packed kernel == reference attention over
    the valid rows."""
    from star_tpu.ops.flash_attention import flash_attention_packed

    b, sq, skv, h, d = shape
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q4 = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k4 = jax.random.normal(ks[1], (b, skv, h, d), jnp.float32)
    v4 = jax.random.normal(ks[2], (b, skv, h, d), jnp.float32)
    valid = kv_valid if kv_valid is not None else skv
    ref = _xla_reference(q4, k4[:, :valid], v4[:, :valid], 1.0 / np.sqrt(d))

    flat = lambda t: t.reshape(t.shape[0], t.shape[1], h * d)
    out = flash_attention_packed(flat(q4), flat(k4), flat(v4), h, None,
                                 128, 128, True, False, kv_valid)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, sq, h, d), np.asarray(ref), atol=2e-5)


def test_packed_exp_bf16_close():
    """bf16-exp2 variant stays within bf16-rounding distance of reference."""
    from star_tpu.ops.flash_attention import flash_attention_packed

    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h * d), jnp.bfloat16)
    q, k, v = mk(ks[0]), mk(ks[1]), mk(ks[2])
    base = flash_attention_packed(q, k, v, h, None, 128, 128, True, False)
    fast = flash_attention_packed(q, k, v, h, None, 128, 128, True, True)
    np.testing.assert_allclose(np.asarray(base, np.float32),
                               np.asarray(fast, np.float32), atol=3e-2)


def test_packed_gradients():
    """Packed custom_vjp (unpacked recompute backward) == XLA grads,
    including a dead-kv-tail case where tail grads must be zero."""
    from star_tpu.ops.flash_attention import flash_attention_packed

    b, s, h, d = 1, 96, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q4 = jax.random.normal(ks[0], (b, s, h, d), jnp.float32) * 0.5
    k4 = jax.random.normal(ks[1], (b, s, h, d), jnp.float32) * 0.5
    v4 = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    flat = lambda t: t.reshape(b, s, h * d)
    valid = 90

    def loss_packed(q, k, v):
        return jnp.sum(flash_attention_packed(
            flat(q), flat(k), flat(v), h, None, 64, 64, True, False,
            valid) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k[:, :valid], v[:, :valid],
                                      1 / np.sqrt(d)) ** 2)

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(q4, k4, v4)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q4, k4, v4)
    np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_r[0]),
                               atol=2e-4, rtol=1e-3)
    for got, want in zip(g_p[1:], g_r[1:]):
        got = np.asarray(got)
        np.testing.assert_allclose(got, np.asarray(want),
                                   atol=2e-4, rtol=1e-3)
        assert np.all(got[:, valid:] == 0)


def test_qk_ln_rope_kernel_matches_reference():
    """Pallas qk-LN+RoPE prologue (interpret) == the jnp reference, incl.
    scale folding and identity table rows."""
    from star_tpu.ops.qk_ln_rope import qk_ln_rope, qk_ln_rope_reference

    b, s, h, d = 2, 80, 4, 64
    c = h * d
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    x = jax.random.normal(ks[0], (b, s, c), jnp.float32) * 2 + 0.5
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (d,))
    bias = 0.1 * jax.random.normal(ks[2], (d,))
    ang = jax.random.uniform(ks[3], (s, c)) * 3.0
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # identity rows at the front (text) like the DiT tables
    cos = cos.at[:7].set(1.0)
    sin = sin.at[:7].set(0.0)

    for fold in (1.0, 0.25):
        ref = qk_ln_rope_reference(x, scale, bias, cos, sin, h,
                                   fold_scale=fold)
        got = qk_ln_rope(x, scale, bias, cos, sin, h, fold_scale=fold,
                         lane_chunk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


def test_packed_prescaled_matches_scaled():
    """prescaled=True on q pre-multiplied by scale*log2e == the normal
    path (forward and gradients)."""
    from star_tpu.ops.flash_attention import (LOG2E, flash_attention_packed)

    b, s, h, d = 1, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h * d), jnp.float32) * 0.5
    q, k, v = mk(ks[0]), mk(ks[1]), mk(ks[2])
    scale = 1.0 / np.sqrt(d)
    base = flash_attention_packed(q, k, v, h, scale, 64, 64, True)
    pre = flash_attention_packed(q * (scale * LOG2E), k, v, h, None,
                                 64, 64, True, False, None, True)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(base), atol=2e-5)

    g1 = jax.grad(lambda q_: jnp.sum(flash_attention_packed(
        q_, k, v, h, scale, 64, 64, True) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(flash_attention_packed(
        q_ * (scale * LOG2E), k, v, h, None, 64, 64, True, False, None,
        True) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-4, rtol=1e-3)
