"""Fused [residual-add +] [LIEM-gate +] LayerNorm Pallas kernel for the
UNet's transformer streams.

Behavioral reference: the BasicTransformerBlock glue at unet_v2v.py:414-491
— every block carries three LayerNorms; the temporal flavor prefixes two of
them with the LIEM channel gate sigmoid(w0*max_c(x) + w1*mean_c(x))
(unet_v2v.py:396-411), and each attention/FF output adds back to the
residual stream. The r4 trace of the 1083 ms CFG step shows this glue as
~30 ms of gate/add passes plus ~28 ms of standalone LN row-stat reduces
over the [2,8,N,C] / [2F,N,C] streams.

One kernel call = ONE pass over the stream:

    xr   = y + resid                    (the new residual, written out)
    g    = sigmoid(w0*max_c(xr) + w1*mean_c(xr))        [optional gate]
    LN(g*xr)*scale + bias

The gate folds ALGEBRAICALLY into the LN affine — g is a per-token scalar,
so mean(g*x) = g*mean(x) and E[(gx)^2] = g^2 E[x^2]: the gated intermediate
is never materialized, stats come from two MXU ones-matmuls on xr, and the
apply is two fused multiply-adds. (The r3 fused_ln kernel lost to the XLA
chain because it materialized the gated tensor and paid ~9 VPU
pass-equivalents for reductions; see its docstring. This one does ~4 dense
passes total.)

Numerics: statistics in fp32 (MXU accumulate + [rb,1] scalar math), bulk
apply in the input dtype — same fp32-island policy as ops/norms.py, drift
gated by test_bf16_gate. CPU/odd shapes fall back to the jnp reference;
training goes through a recompute VJP.

NEGATIVE RESULT (r4, keep UNROUTED): the on-chip A/B (tools/negative_results/ab_streamfuse.py,
scan-amortized, one process) LOSES to the XLA chain at every UNet stream
scale despite the algebraic gate fold — gated+resid fused/xla ms:
C=320 3.84/2.80 (0.73x), C=640 2.02/1.58 (0.79x), C=1280 1.98/1.08 (0.55x);
plain+resid 0.62x/0.75x/0.77x. Same conclusion as tools/negative_results/fused_ln.py from the
other direction: in-graph XLA fuses the add/gate/stat passes into producers
(standalone A/Bs would UNDERSTATE the chain, yet the kernel loses even
against the standalone chain), and C%128!=0 rows tile as masked vregs. The
UNet's elementwise tail will not fall to a row-norm kernel at these channel
counts; see CLAUDE.md. Do not route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rb(rows: int, c: int, n_streams: int) -> int | None:
    """Largest multiple-of-8 divisor of rows fitting the VMEM budget
    (double-buffered streams + a couple of live temps)."""
    best = None
    cap = 10e6
    for rb in range(8, min(rows, 4096) + 1, 8):
        if rows % rb:
            continue
        if rb * c * 2 * (2 * n_streams + 2) <= cap:
            best = rb
    return best


def _kernel(x_ref, *rest, eps, gated, has_res, cdim):
    if has_res:
        res_ref, sc_ref, bi_ref = rest[0], rest[1], rest[2]
        rest = rest[3:]
    else:
        sc_ref, bi_ref = rest[0], rest[1]
        rest = rest[2:]
    if gated:
        gw_ref = rest[0]
        rest = rest[1:]
    if has_res:
        out_ref, xr_ref = rest[0], rest[1]
    else:
        out_ref = rest[0]

    xr = x_ref[...]                                     # [rb, C] input dtype
    if has_res:
        xr = xr + res_ref[...]
        xr_ref[...] = xr

    ones = jnp.ones((cdim, 8), xr.dtype)
    dot = lambda a: jax.lax.dot_general(
        a, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[:, :1]      # [rb, 1] fp32
    c_inv = 1.0 / cdim
    mean = dot(xr) * c_inv
    m2 = dot(xr * xr) * c_inv
    if gated:
        mx = jnp.max(xr, axis=-1, keepdims=True).astype(jnp.float32)
        g = jax.nn.sigmoid(mx * gw_ref[0, 0] + mean * gw_ref[0, 1])
        mean = g * mean
        m2 = g * g * m2
    else:
        g = None
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    s = (inv if g is None else g * inv).astype(xr.dtype)      # [rb, 1]
    r = (-mean * inv).astype(xr.dtype)
    y = (xr * s + r) * sc_ref[...].astype(xr.dtype) \
        + bi_ref[...].astype(xr.dtype)
    out_ref[...] = y.astype(out_ref.dtype)


def _reference(y, resid, gate_w, scale, bias, eps):
    """jnp reference (fp32 stats, bulk in y.dtype) — fallback and VJP."""
    xr = y if resid is None else y + resid
    x32 = xr.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    m2 = jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True)
    if gate_w is not None:
        gw = gate_w.astype(jnp.float32)
        mx = jnp.max(x32, axis=-1, keepdims=True)
        g = jax.nn.sigmoid(mx * gw[0] + mean * gw[1])
        mean, m2 = g * mean, g * g * m2
    else:
        g = None
    var = jnp.maximum(m2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    s = (inv if g is None else g * inv).astype(xr.dtype)
    r = (-mean * inv).astype(xr.dtype)
    out = (xr * s + r) * scale.astype(xr.dtype) + bias.astype(xr.dtype)
    return (out, xr) if resid is not None else (out, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _dispatch(y, resid, gate_w, scale, bias, eps, interpret):
    from star_tpu.ops.attention import _on_tpu
    shape = y.shape
    c = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    n_streams = 3 if resid is None else 5               # r/w streams per row
    rb = _pick_rb(rows, c, n_streams)
    if not (_on_tpu() or interpret) or rb is None:
        return _reference(y, resid, gate_w, scale, bias, eps)

    x2 = y.reshape(rows, c)
    args = [x2]
    in_specs = [pl.BlockSpec((rb, c), lambda i: (i, 0))]
    if resid is not None:
        args.append(resid.reshape(rows, c))
        in_specs.append(pl.BlockSpec((rb, c), lambda i: (i, 0)))
    args += [scale.reshape(1, c).astype(jnp.float32),
             bias.reshape(1, c).astype(jnp.float32)]
    in_specs += [pl.BlockSpec((1, c), lambda i: (0, 0))] * 2
    if gate_w is not None:
        args.append(gate_w.reshape(1, 2).astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_shape = [jax.ShapeDtypeStruct((rows, c), y.dtype)]
    out_specs = [pl.BlockSpec((rb, c), lambda i: (i, 0))]
    if resid is not None:
        out_shape.append(jax.ShapeDtypeStruct((rows, c), y.dtype))
        out_specs.append(pl.BlockSpec((rb, c), lambda i: (i, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, gated=gate_w is not None,
                          has_res=resid is not None, cdim=c),
        grid=(rows // rb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=rows * c * 8,
            bytes_accessed=rows * c * 2 * (2 if resid is None else 4),
            transcendentals=rows),
        interpret=interpret,
    )(*args)
    normed = out[0].reshape(shape)
    if resid is not None:
        return normed, out[1].reshape(shape)
    return normed, None


def _fwd(y, resid, gate_w, scale, bias, eps, interpret):
    out = _dispatch(y, resid, gate_w, scale, bias, eps, interpret)
    return out, (y, resid, gate_w, scale, bias)


def _bwd(eps, interpret, saved, ct):
    _, vjp = jax.vjp(lambda *a: _reference(*a, eps), *saved)
    return vjp(ct)


_dispatch.defvjp(_fwd, _bwd)


def fused_resid_liem_ln(y: jax.Array, scale: jax.Array, bias: jax.Array, *,
                        resid: jax.Array | None = None,
                        gate_w: jax.Array | None = None,
                        eps: float = 1e-5,
                        interpret: bool = False):
    """[resid-add +] [LIEM gate +] LayerNorm over the last axis, one pass.

    y: [..., C]; scale/bias: [C]; gate_w: [2] (the TemporalLIEM Dense's
    weight — w0 multiplies the channel max, w1 the channel mean); resid:
    same shape as y. Returns (normed, new_resid) where new_resid = y + resid
    (None when resid is None). Differentiable via a recompute VJP.
    """
    return _dispatch(y, resid, gate_w, scale, bias, eps, interpret)
