"""Differentiable conv with fp32 accumulation for low-precision operands.

jax 0.9's conv transpose rule rejects `preferred_element_type=f32` when the
operands are bf16: the incoming cotangent is fp32 and
`lax.conv_general_dilated` requires equal operand dtypes, so any
`jax.grad` through such a conv raises. This wrapper keeps the fp32-output
primal (the inference kernels rely on fp32 taps before bias/blend math) and
implements the backward pass as the standard mixed-precision rule: cast the
cotangent to the operand dtype and transpose an operand-dtype conv (exactly
what torch autocast does — bf16 gradient convs).

Only needed where a conv mixes bf16 operands with an fp32 preferred output
on a TRAINING path (ops/temporal_conv, ops/upsample_conv); equal-dtype convs
differentiate fine without it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv_f32acc(x: jax.Array, kernel: jax.Array, window_strides,
                padding, dimension_numbers) -> jax.Array:
    """conv_general_dilated(..., preferred_element_type=f32) that is
    differentiable for bf16 operands. `window_strides`/`padding` must be
    hashable (tuples or 'SAME'/'VALID')."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides, padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32)


def _fwd(x, kernel, window_strides, padding, dimension_numbers):
    return conv_f32acc(x, kernel, window_strides, padding,
                       dimension_numbers), (x, kernel)


def _bwd(window_strides, padding, dimension_numbers, res, g):
    x, kernel = res

    def conv_plain(x_, k_):
        return jax.lax.conv_general_dilated(
            x_, k_, window_strides, padding,
            dimension_numbers=dimension_numbers)

    _, vjp = jax.vjp(conv_plain, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk.astype(kernel.dtype)


conv_f32acc.defvjp(_fwd, _bwd)
