"""Fused LayerNorm (+ optional LIEM channel gate) for TPU (Pallas).

The UNet's transformer streams are LN-heavy: every BasicTransformerBlock
(reference unet_v2v.py:414-491) carries three LayerNorms, and the temporal
flavor prefixes two of them with a LIEM channel gate
(sigmoid(w0*max_c + w1*mean_c), unet_v2v.py:396-411). XLA lowers each
LN/gate chain to separate stats + apply passes over the activation — the
r3g full-step trace shows ~150 ms of LN/GN stat passes plus ~127 ms of
temporal-stream glue spread over ~700 small fusions, each re-reading the
tensor from HBM.

This kernel runs the whole per-row chain in ONE pass over the natural
row-major [..., C] layout the channel projections produce:

    [gate: mx/mn lane-reduce -> sigmoid -> mul]  (fp32, in VMEM)
    mean/meansq lane-reduce -> rsqrt -> affine   (fp32 stats island)

so each site costs exactly one HBM read + one write. The C axis sits whole
on the vector lanes (blocks span the full channel dim — the UNet's 320/640/
1280 are not 128-multiples, which is legal only for full-dim blocks).

Backward: XLA recompute via the jnp reference (x is saved; the chain is
cheap to re-derive relative to the matmuls around it).

MEASURED RESULT (r3, v5e, scan-amortized single-process A/B — do NOT route
this without re-measuring): the kernel LOSES to the XLA chain at the UNet's
dominant C=320 scale — 1.78 vs 1.40 ms gated at [2,8,14400,320], 2.85 vs
1.89 ms plain at [32,14400,320] (~167-212 GB/s in-kernel; rb sweep 512-2048
moved it <6%, rb=4096 OOMs scoped VMEM) — and only ties at C=1280
(0.66 vs 0.70 ms). The 320-lane rows tile as 2.5 masked vregs, and swapping
the lane-rotate reductions for MXU ones-matmuls changed nothing, so the
bottleneck is the masked-lane VPU throughput, not the reductions. In-graph
XLA is even harder to beat: it fuses the LN stats pass into the producing
op. Kept in-tree unrouted as the record of that measurement (the
models/unet/blocks.py call sites stay on the jnp chain).
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rb(rows: int, c: int) -> int | None:
    """Largest multiple-of-8 divisor of `rows` under the VMEM budget.

    Budget: bf16 in/out blocks double-buffered + ~3 live fp32 temps
    ≈ 12 bytes per element; keep the working set near 6MB."""
    cap = min(1024, int(6e6 // (c * 12)) // 8 * 8)
    for cand in range(cap, 63, -8):
        if rows % cand == 0:
            return cand
    return None


def _kernel(x_ref, sc_ref, bi_ref, gw_ref, o_ref, *, eps: float, gated: bool):
    # Lane reductions as MXU ones-matmuls ([rb,C]@[C,128], fp32 accumulators)
    # — a lane-rotate jnp.sum costs ~9 VPU passes over the tile and made the
    # v1 kernel SLOWER than the XLA chain at C=320 (measured 165 GB/s vs
    # XLA's 208). Bulk math stays in the input dtype (bf16 deployment); only
    # the [rb,1] statistics live in fp32 — the same policy as ops/norms.py's
    # GroupNorm apply.
    x = x_ref[...]                                      # [rb, C] input dtype
    c = x.shape[-1]
    c_inv = 1.0 / c
    ones = jnp.ones((c, 128), x.dtype)
    dot = lambda a: jax.lax.dot_general(
        a, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[:, :1]      # [rb, 1] fp32
    if gated:
        gw = gw_ref[...]                                # [1, 128] fp32
        mx = jnp.max(x, axis=-1, keepdims=True).astype(jnp.float32)
        mn = dot(x) * c_inv
        g = jax.nn.sigmoid(mx * gw[0, 0] + mn * gw[0, 1])
        x = x * g.astype(x.dtype)
    mean = dot(x) * c_inv
    m2 = dot(x * x) * c_inv
    inv = jax.lax.rsqrt(jnp.maximum(m2 - mean * mean, 0.0) + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) \
        * sc_ref[...].astype(x.dtype) + bi_ref[...].astype(x.dtype)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_ln_reference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                       eps: float = 1e-5,
                       gate_w: jax.Array | None = None) -> jax.Array:
    """jnp reference / CPU fallback (same math and fp32 islands)."""
    x32 = x.astype(jnp.float32)
    if gate_w is not None:
        gw = gate_w.astype(jnp.float32)
        mx = jnp.max(x32, axis=-1, keepdims=True)
        mn = jnp.mean(x32, axis=-1, keepdims=True)
        x32 = x32 * jax.nn.sigmoid(mx * gw[0] + mn * gw[1])
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(m2 - mean * mean, 0.0) + eps)
    y = (x32 - mean) * inv * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _impl(x, scale, bias, gate_w, eps, interpret):
    from star_tpu.ops.attention import _on_tpu
    shape = x.shape
    c = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    try:
        forced = int(os.environ.get('STAR_FUSED_LN_RB', 0))
    except ValueError:
        warnings.warn('STAR_FUSED_LN_RB is not an integer; ignoring')
        forced = 0
    # A forced rb must satisfy the same invariants _pick_rb guarantees:
    # it tiles rows exactly (grid floors otherwise, leaving trailing rows
    # unwritten) and keeps sublane alignment.
    if forced and (forced > rows or rows % forced or forced % 8):
        warnings.warn(f'STAR_FUSED_LN_RB={forced} invalid for rows={rows}; '
                      'falling back to _pick_rb')
        forced = 0
    rb = forced or (_pick_rb(rows, c) if rows else None)
    if (rb is None or c > 4096 or c % 8
            or not (_on_tpu() or interpret)):
        return fused_ln_reference(x, scale, bias, eps, gate_w)

    gated = gate_w is not None
    gw = jnp.zeros((1, 128), jnp.float32)
    if gated:
        gw = gw.at[0, :2].set(gate_w.astype(jnp.float32).reshape(2))
    sc = scale.astype(jnp.float32).reshape(1, c)
    bi = bias.astype(jnp.float32).reshape(1, c)

    x2 = x.reshape(rows, c)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, gated=gated),
        grid=(rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        cost_estimate=pl.CostEstimate(
            flops=(12 if gated else 8) * rows * c,
            bytes_accessed=rows * c * 4 + c * 8,
            transcendentals=rows * (2 if gated else 1)),
        interpret=interpret,
    )(x2, sc, bi, gw)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _plain(x, scale, bias, eps, interpret):
    return _impl(x, scale, bias, None, eps, interpret)


def _plain_fwd(x, scale, bias, eps, interpret):
    return _plain(x, scale, bias, eps, interpret), (x, scale, bias)


def _plain_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: fused_ln_reference(x_, s_, b_, eps), x, scale,
        bias)
    return vjp(g)


_plain.defvjp(_plain_fwd, _plain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gated(x, scale, bias, gate_w, eps, interpret):
    return _impl(x, scale, bias, gate_w, eps, interpret)


def _gated_fwd(x, scale, bias, gate_w, eps, interpret):
    return (_gated(x, scale, bias, gate_w, eps, interpret),
            (x, scale, bias, gate_w))


def _gated_bwd(eps, interpret, res, g):
    x, scale, bias, gate_w = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_, w_: fused_ln_reference(x_, s_, b_, eps, w_),
        x, scale, bias, gate_w)
    return vjp(g)


_gated.defvjp(_gated_fwd, _gated_bwd)


def fused_ln(x: jax.Array, scale: jax.Array, bias: jax.Array,
             eps: float = 1e-5, gate_w: jax.Array | None = None,
             interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis (fp32 stats), optionally prefixed by the
    LIEM channel gate x *= sigmoid(gate_w[0]*max_c(x) + gate_w[1]*mean_c(x)).

    x: [..., C]; scale/bias: [C]; gate_w: [2] (TemporalLIEM's Dense(2->1,
    no-bias) kernel, max-row first — unet_v2v.py:396-411)."""
    if gate_w is None:
        return _plain(x, scale, bias, eps, interpret)
    return _gated(x, scale, bias, gate_w.reshape(2), eps, interpret)
