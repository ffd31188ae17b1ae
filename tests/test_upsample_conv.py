"""Phase-decomposed upsample-conv == nearest-2x + SAME 3x3 conv.

Covers the op that replaces the SVD decoder's Upsample2D
(video_to_video_model.py:57-63 wrapped diffusers decoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.resize import upsample2x_nearest
from star_tpu.ops.upsample_conv import UpsampleConv2x, upsample_conv2x


def _reference(x, kernel, bias):
    y = upsample2x_nearest(x)
    z = jax.lax.conv_general_dilated(
        y, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    return (z + bias.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize('shape,cout', [
    ((2, 5, 7, 8), 6),     # odd sizes: exercises every boundary phase
    ((1, 8, 8, 4), 4),
])
def test_matches_nearest_then_conv(shape, cout):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, shape[-1], cout), jnp.float32)
    bias = jax.random.normal(k3, (cout,), jnp.float32)
    got = upsample_conv2x(x, kernel, bias)
    ref = _reference(x, kernel, bias)
    assert got.shape == ref.shape == (shape[0], 2 * shape[1], 2 * shape[2],
                                      cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_module_param_tree_matches_nn_conv():
    from flax import linen as nn
    x = jnp.zeros((1, 4, 4, 8))
    mod = UpsampleConv2x(8)
    ref = nn.Conv(8, (3, 3), padding=1)
    p = mod.init(jax.random.PRNGKey(0), x)
    q = ref.init(jax.random.PRNGKey(0), upsample2x_nearest(x))
    assert jax.tree.map(jnp.shape, p) == jax.tree.map(jnp.shape, q)
    # module output == function output with the same params
    y1 = mod.apply(p, x)
    y2 = upsample_conv2x(x, p['params']['kernel'], p['params']['bias'])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


def test_cropped_matches_unet_upsample_spelling():
    """upsample_conv2x_cropped == nearest-2x -> crop 1 row top/bottom ->
    SAME 3x3 conv (the I2VGen-XL UNet Upsample, unet_v2v.py:532-567),
    including the boundary rows the crop makes special."""
    from star_tpu.ops.upsample_conv import upsample_conv2x_cropped

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    for shape, cout in [((2, 5, 7, 8), 6), ((1, 4, 8, 4), 4)]:
        x = jax.random.normal(k1, shape, jnp.float32)
        kernel = jax.random.normal(k2, (3, 3, shape[-1], cout), jnp.float32)
        bias = jax.random.normal(k3, (cout,), jnp.float32)
        y = upsample2x_nearest(x)[:, 1:-1]
        ref = jax.lax.conv_general_dilated(
            y, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + bias
        got = upsample_conv2x_cropped(x, kernel, bias)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_grad_through_f32acc_conv():
    """jax 0.9's conv transpose rule rejects preferred_element_type=f32 with
    bf16 operands (fp32 cotangent vs bf16 kernel) — ops/conv_acc.py works
    around it with a custom_vjp. Regression: grad through bf16 upsample-conv
    and temporal_conv3 must not raise and must be finite/nonzero."""
    from star_tpu.ops.temporal_conv import temporal_conv3

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (1, 6, 8, 4), jnp.bfloat16)
    kernel = jax.random.normal(k2, (3, 3, 4, 4), jnp.bfloat16)
    bias = jnp.zeros((4,), jnp.float32)

    def f_up(k):
        return jnp.sum(upsample_conv2x(x, k, bias).astype(jnp.float32))

    g = jax.grad(f_up)(kernel)
    assert g.dtype == kernel.dtype
    assert np.isfinite(np.asarray(g, np.float32)).all()
    assert float(jnp.max(jnp.abs(g.astype(jnp.float32)))) > 0

    kt = jax.random.normal(k3, (3, 1, 4, 4), jnp.bfloat16)

    def f_t(k):
        return jnp.sum(temporal_conv3(x, k, bias).astype(jnp.float32))

    gt = jax.grad(f_t)(kt)
    assert gt.dtype == kt.dtype
    assert np.isfinite(np.asarray(gt, np.float32)).all()
    assert float(jnp.max(jnp.abs(gt.astype(jnp.float32)))) > 0
