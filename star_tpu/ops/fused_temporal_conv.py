"""Fused GroupNorm+SiLU+temporal-conv(3,1,1) Pallas kernel for the UNet's
TemporalConvBlockV2 chain.

Behavioral reference: unet_v2v.py:1194-1278 — four chained
GN(32)+SiLU+[Dropout]+Conv3d(k=(3,1,1)) stages with a residual add. The
current XLA spelling (r4 trace of the 1143 ms CFG step) pays, per conv:
  * a GN statistics reduce over the whole [B,F,N,C] stream
    (convert_reduce_fusion families (f32[2,320])x15 / [2,640]x21 /
    [2,1280]x54 ~= 56 ms/step),
  * two materialized frame-shifted copies of the stream for the im2col
    concat (pad_slice_fusion tuple families ~= 36 ms/step),
  * a GN-apply + SiLU glue pass,
  * the [*, 3C] x [3C, C] gemm.

This kernel runs each stage in ONE pass: the (3,1,1) conv has NO spatial
halo — the frame shifts live entirely inside a [F, nb, C] block — so the
GN apply (folded coefficients from threaded statistics, the
ops/conv3x3.py scheme), the SiLU, the three tap matmuls (fp32 accumulate),
the bias/residual epilogue and the output (sum, sumsq) statistics all
happen on one VMEM-resident block: HBM traffic is exactly read-x + write-y.
Statistics THREAD through the 4-stage chain — each call emits the fp32
per-(batch, channel) sums of its output, so the next GN never re-reads the
activation; only the chain entry pays an XLA stats reduce (which XLA fuses
into the producer).

Same param tree as TemporalConv3 (nn.Conv((3,1)) spelling): converters,
checkpoints, goldens untouched. CPU / non-qualifying shapes / training-
with-dropout fall back to the jnp chain with identical semantics (modulo
the documented bf16-SiLU-vs-fp32-SiLU drift, gated by test_bf16_gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3x3 import channel_stats, gn_coeffs

Stats = tuple[jax.Array, jax.Array]


def _pick_nb(n: int, f: int, c: int, cout: int, has_res: bool,
             budget: float = 12e6) -> int | None:
    """Largest multiple-of-8 divisor of N whose block working set fits:
    double-buffered x/out (+residual) blocks, the SiLU'd bf16 temp, and the
    per-frame fp32 accumulators."""
    best = None
    for nb in range(8, min(n, 2048) + 1, 8):
        if n % nb:
            continue
        bytes_ = f * nb * (2 * c * 2 * 2        # x block, silu temp (bf16)
                           + 2 * cout * 2)      # out block
        if has_res:
            bytes_ += f * nb * 2 * cout * 2
        bytes_ += 3 * nb * cout * 4             # fp32 tap accumulators
        if bytes_ <= budget:
            best = nb
    return best


def _kernel(x_ref, a_ref, b_ref, k_ref, bias_ref, *rest,
            f, c, cout, has_res, want_stats, per_frame=False):
    if has_res:
        res_ref, out_ref = rest[0], rest[1]
        stat_refs = rest[2:]
    else:
        out_ref = rest[0]
        stat_refs = rest[1:]

    n_i = pl.program_id(1)

    # prologue: y = silu(x * a + b) in the input dtype (a/b are the folded
    # fp32 GN coefficients for this batch row, cast once)
    xv = x_ref[0]                                       # [F, nb, C]
    av = a_ref[0, 0].astype(xv.dtype)[None, None]
    bv = b_ref[0, 0].astype(xv.dtype)[None, None]
    yv = xv * av + bv
    sig = 1.0 / (1.0 + jnp.exp(jnp.negative(yv)))       # exp-form sigmoid:
    yv = yv * sig             # logistic primitive trips Mosaic on bf16
    bias_v = bias_ref[0, 0]                             # [Cout] fp32

    s_acc = s2_acc = None
    s_rows, s2_rows = [], []
    # per-output-frame tap matmuls: out[f] = W0 @ y[f-1] + W1 @ y[f]
    # + W2 @ y[f+1] (SAME padding over frames: edge taps simply drop out).
    # F is static and small (8 in deployment), so the python loop unrolls.
    for fi in range(f):
        acc = jax.lax.dot_general(
            yv[fi], k_ref[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fi > 0:
            acc = acc + jax.lax.dot_general(
                yv[fi - 1], k_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if fi < f - 1:
            acc = acc + jax.lax.dot_general(
                yv[fi + 1], k_ref[2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        ob = (acc + bias_v[None]).astype(out_ref.dtype)
        if has_res:
            ob = ob + res_ref[0, fi]
        out_ref[0, fi] = ob
        if want_stats:
            of = ob.astype(jnp.float32)
            s = jnp.sum(of, axis=0)
            s2 = jnp.sum(jax.lax.square(of), axis=0)
            if per_frame:
                s_rows.append(s)
                s2_rows.append(s2)
            else:
                s_acc = s if s_acc is None else s_acc + s
                s2_acc = s2 if s2_acc is None else s2_acc + s2

    if want_stats:
        sum_ref, sq_ref = stat_refs

        if per_frame:
            # per-output-frame (sum, sumsq) rows: [1, F, Cout] block,
            # static sublane-row stores (fi is a python-unrolled index)
            @pl.when(n_i == 0)
            def _():
                for fi in range(f):
                    sum_ref[0, fi] = s_rows[fi]
                    sq_ref[0, fi] = s2_rows[fi]

            @pl.when(n_i != 0)
            def _():
                for fi in range(f):
                    sum_ref[0, fi] = sum_ref[0, fi] + s_rows[fi]
                    sq_ref[0, fi] = sq_ref[0, fi] + s2_rows[fi]
        else:
            @pl.when(n_i == 0)
            def _():
                sum_ref[0, 0] = s_acc
                sq_ref[0, 0] = s2_acc

            @pl.when(n_i != 0)
            def _():
                sum_ref[0, 0] = sum_ref[0, 0] + s_acc
                sq_ref[0, 0] = sq_ref[0, 0] + s2_acc


def _tconv_xla(x, a, b, kernel, bias, residual, want_stats,
               per_frame=False):
    """jnp fallback with identical semantics (bulk apply in x.dtype, fp32
    tap accumulation — the im2col spelling of ops/temporal_conv.py)."""
    bsz, f, n, c = x.shape
    cout = kernel.shape[-1]
    y = x * a.astype(x.dtype)[:, None, None] + b.astype(x.dtype)[:, None, None]
    y = y * jax.nn.sigmoid(y)
    kb = kernel.reshape(3 * c, cout).astype(x.dtype)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
    ys = jnp.concatenate([yp[:, tap:tap + f] for tap in range(3)], axis=-1)
    out = jnp.einsum('bfnc,cd->bfnd', ys, kb,
                     preferred_element_type=jnp.float32)
    out = (out + bias.astype(jnp.float32)).astype(x.dtype)
    if residual is not None:
        out = out + residual
    if want_stats:
        pool = out.reshape(bsz * f, n, cout) if per_frame \
            else out.reshape(bsz, f * n, cout)
        s, s2 = channel_stats(pool)
        return out, (s, s2)
    return out, None


def _reference(x, gn_scale, gn_bias, kernel, bias, stats, residual,
               num_groups, eps, want_stats, per_frame=False):
    bsz, f, n, c = x.shape
    if stats is None:
        stats = channel_stats(x.reshape(bsz, f * n, c))
    a, b = gn_coeffs(stats, f * n * (c // num_groups), gn_scale, gn_bias,
                     num_groups, eps)
    return _tconv_xla(x, a, b, kernel[:, 0], bias, residual, want_stats,
                      per_frame)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _dispatch(x, gn_scale, gn_bias, kernel, bias, stats, residual,
              num_groups, eps, want_stats, interpret, per_frame=False):
    bsz, f, n, c = x.shape
    cout = kernel.shape[-1]
    if stats is None:
        stats = channel_stats(x.reshape(bsz, f * n, c))
    a, b = gn_coeffs(stats, f * n * (c // num_groups), gn_scale, gn_bias,
                     num_groups, eps)
    kern3 = kernel[:, 0]                                # [3, C, Cout]
    del stats  # consumed into (a, b); _dispatch args keep the original

    from .attention import _on_tpu
    nb = _pick_nb(n, f, c, cout, residual is not None)
    if not (_on_tpu() or interpret) or nb is None or n % 8 or f < 2:
        return _tconv_xla(x, a, b, kern3, bias, residual, want_stats,
                          per_frame)

    in_specs = [
        pl.BlockSpec((1, f, nb, c), lambda bi, ni: (bi, 0, ni, 0)),
        pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0)),       # a
        pl.BlockSpec((1, 1, c), lambda bi, ni: (bi, 0, 0)),       # b
        pl.BlockSpec((3, c, cout), lambda bi, ni: (0, 0, 0)),     # taps
        pl.BlockSpec((1, 1, cout), lambda bi, ni: (0, 0, 0)),     # bias
    ]
    args = [x, a.reshape(bsz, 1, c), b.reshape(bsz, 1, c),
            kern3.astype(x.dtype),
            bias.reshape(1, 1, cout).astype(jnp.float32)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, f, nb, cout),
                                     lambda bi, ni: (bi, 0, ni, 0)))
        args.append(residual)
    out_shape = [jax.ShapeDtypeStruct((bsz, f, n, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, f, nb, cout),
                              lambda bi, ni: (bi, 0, ni, 0))]
    if want_stats:
        frows = f if per_frame else 1
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((bsz, frows, cout),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((1, frows, cout),
                                          lambda bi, ni: (bi, 0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, f=f, c=c, cout=cout,
                          has_res=residual is not None,
                          want_stats=want_stats, per_frame=per_frame),
        grid=(bsz, n // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * f * n * 3 * c * cout,
            bytes_accessed=(x.size + bsz * f * n * cout) * 2,
            transcendentals=bsz * f * n * c),
        interpret=interpret,
    )(*args)
    if want_stats:
        rows = bsz * f if per_frame else bsz
        return out[0], (out[1].reshape(rows, cout),
                        out[2].reshape(rows, cout))
    return out[0], None


def _fwd(x, gn_scale, gn_bias, kernel, bias, stats, residual,
         num_groups, eps, want_stats, interpret, per_frame=False):
    out = _dispatch(x, gn_scale, gn_bias, kernel, bias, stats, residual,
                    num_groups, eps, want_stats, interpret, per_frame)
    return out, (x, gn_scale, gn_bias, kernel, bias, stats, residual)


def _bwd(num_groups, eps, want_stats, interpret, per_frame, saved, ct):
    # XLA-recompute backward through the jnp reference (same policy as
    # ops/conv3x3.py / ops/flash_attention.py): the fused forward is cheap
    # to re-derive relative to the surrounding matmuls.
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, num_groups, eps, want_stats, per_frame),
        *saved)
    return vjp(ct)


_dispatch.defvjp(_fwd, _bwd)


def fused_gn_silu_tconv3(x: jax.Array, gn_scale: jax.Array,
                         gn_bias: jax.Array, kernel: jax.Array,
                         bias: jax.Array, *,
                         stats: Stats | None = None,
                         residual: jax.Array | None = None,
                         want_stats: bool = False,
                         num_groups: int = 32, eps: float = 1e-5,
                         interpret: bool = False,
                         stats_per_frame: bool = False):
    """GroupNorm(x) -> SiLU -> (3,1,1) temporal conv (+bias) [+ residual].

    x: [B, F, N, C] (N = H*W, N % 8 == 0); kernel [3, 1, Cin, Cout] fp32
    (nn.Conv((3,1)) tree). GN statistics pool over (F, N, C/G) per batch
    element — torch GroupNorm semantics on the video tensor
    (unet_v2v.py:1201). `stats` is the fp32 (sum, sumsq) [B, C] of x (e.g.
    the previous stage's `want_stats` output); computed here when absent.
    Returns (y [B, F, N, Cout], stats_of_y | None). With
    `stats_per_frame=True` the output stats are per-(batch, frame) rows
    [B*F, C] — the granularity the NEXT per-frame spatial GroupNorm needs
    (SVD decoder SpatioTemporalResBlock chain). Differentiable via an
    XLA-recompute VJP.
    """
    return _dispatch(x, gn_scale, gn_bias, kernel, bias, stats, residual,
                     num_groups, eps, want_stats, interpret,
                     stats_per_frame)
