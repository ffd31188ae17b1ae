"""Fused LIEM-gate + LayerNorm kernel (tools/negative_results/fused_ln.py): interpret-mode
kernel vs jnp reference vs the unfused formulation it replaces."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fused_ln import fused_ln, fused_ln_reference
from star_tpu.ops.norms import layer_norm


def _mk(shape, key=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype) * 1.7


@pytest.mark.parametrize('shape,gated', [
    ((4, 128, 320), False),
    ((4, 128, 320), True),
    ((2, 8, 64, 1280), True),
    ((512, 640), False),
])
def test_kernel_matches_reference(shape, gated):
    c = shape[-1]
    x = _mk(shape)
    scale = _mk((c,), 1) * 0.1 + 1.0
    bias = _mk((c,), 2) * 0.1
    gw = _mk((2,), 3) if gated else None
    got = fused_ln(x, scale, bias, 1e-5, gate_w=gw, interpret=True)
    want = fused_ln_reference(x, scale, bias, 1e-5, gate_w=gw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_matches_unfused_liem_ln_chain():
    """gated fused_ln == sigmoid(w0*max+w1*mean) gate then LayerNorm."""
    x = _mk((2, 8, 32, 256))
    scale = _mk((256,), 1) * 0.1 + 1.0
    bias = _mk((256,), 2) * 0.1
    gw = _mk((2,), 3)
    mx = jnp.max(x, axis=-1, keepdims=True)
    mn = jnp.mean(x, axis=-1, keepdims=True)
    gx = jax.nn.sigmoid(mx * gw[0] + mn * gw[1]) * x
    want = layer_norm(gx, scale, bias, 1e-5)
    got = fused_ln(x, scale, bias, 1e-5, gate_w=gw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bf16_dtype_preserved():
    x = _mk((4, 128, 320), dtype=jnp.bfloat16)
    scale = jnp.ones((320,), jnp.float32)
    bias = jnp.zeros((320,), jnp.float32)
    out = fused_ln(x, scale, bias, 1e-5, gate_w=jnp.ones((2,)),
                   interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = fused_ln_reference(x, scale, bias, 1e-5, jnp.ones((2,)))
    # kernel applies in bf16 with fp32 stats (the ops/norms.py GroupNorm
    # policy); reference rounds once at the end — a few bf16 ulps apart
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)


def test_gradients_flow():
    x = _mk((8, 64, 128))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    gw = jnp.array([0.3, -0.2], jnp.float32)

    def loss(x, s, b, w):
        return jnp.sum(fused_ln(x, s, b, 1e-5, gate_w=w) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, scale, bias, gw)

    def loss_ref(x, s, b, w):
        return jnp.sum(fused_ln_reference(x, s, b, 1e-5, w) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, gw)
    for g, w in zip(grads, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4,
                                   rtol=1e-4)
    assert all(jnp.all(jnp.isfinite(g)) for g in grads)
    assert float(jnp.abs(grads[3]).sum()) > 0


def test_fallback_on_odd_rows():
    # rows=5*7=35 has no multiple-of-8 divisor — must fall back, same math
    x = _mk((5, 7, 320))
    scale = jnp.ones((320,), jnp.float32)
    bias = jnp.zeros((320,), jnp.float32)
    got = fused_ln(x, scale, bias, 1e-5, interpret=True)
    want = fused_ln_reference(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
