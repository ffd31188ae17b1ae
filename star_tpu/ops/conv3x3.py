"""Fused GroupNorm-apply + SiLU + 3x3 SAME conv Pallas kernel (+ bias,
optional residual add, optional next-GN statistics), and a one-pass 2x2
phase-interleave kernel for the phase-decomposed upsample.

Why: the 720p SVD-VAE decoder spends ~790 ms/call in XLA conv fusions that
sustain only ~105 TF/s on v5e (r3 trace, tools/profile_vae.py), plus
~120 ms of pad/maximum/copy passes interleaving the four upsample phase
outputs. XLA's conv lowering is the ceiling there (tools/probe_vae_conv.py:
bare convs 63-86 TF/s + a convert pass; GN/SiLU prologues fused in-model
reach 105 TF/s). This kernel streams H-row blocks through VMEM with manual
halo DMA and runs the 9 taps as full-depth [W, C] @ [C, Cout] MXU matmuls
accumulating per output row in fp32 vregs — no fp32 activation temps, no
layout copies.

Reference semantics: diffusers ResnetBlock2D / Encoder blocks inside
AutoencoderKLTemporalDecoder (video_to_video_model.py:57-63):
GroupNorm(32, C, eps=1e-6) -> SiLU -> Conv2d(3x3, SAME) -> (+residual).

Layout contract: x [N, H, W, C] bf16 channels-last, C and Cout multiples of
128 (lane-aligned), W % 8 == 0 (sublane-aligned). GN coefficients arrive
folded per (frame, channel): y = silu(x * a + b) with
a = rsqrt(var + eps) * scale, b = gn_bias - mean * a, both bf16 (matching
the bf16-apply policy of ops/norms.py; drift gated by test_bf16_gate).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# helpers


def channel_stats(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(leading, channel) fp32 (sum, sum-of-squares) over all middle axes.

    x: [N, ..., C] -> ([N, C], [N, C]). XLA fuses these reductions into the
    op that produced x, so computing them here is (nearly) free when the
    producer is a conv/fusion — the same structure the r2/r3 traces show.
    """
    n, c = x.shape[0], x.shape[-1]
    xf = x.reshape(n, -1, c)
    s = jnp.sum(xf, axis=1, dtype=jnp.float32)
    s2 = jnp.sum(jax.lax.square(xf.astype(jnp.float32)), axis=1)
    return s, s2


def gn_coeffs(stats: tuple[jax.Array, jax.Array], count: int,
              scale: jax.Array, bias: jax.Array, num_groups: int,
              eps: float) -> tuple[jax.Array, jax.Array]:
    """Fold GN statistics into per-(n, channel) apply coefficients.

    stats: (sum, sumsq) [N, C] fp32 accumulated over `count` elements per
    (n, group-channel) — i.e. count = prod(middle dims) * (C // G) elements
    contribute to each group's mean. Returns (a, b) fp32 [N, C] with
    GN(x) * scale + bias == x * a + b.
    """
    s, s2 = stats
    n, c = s.shape
    g = num_groups
    sg = s.reshape(n, g, c // g).sum(-1)
    s2g = s2.reshape(n, g, c // g).sum(-1)
    mean = sg / count
    var = s2g / count - jax.lax.square(mean)
    inv = jax.lax.rsqrt(var + eps)                      # [N, G]
    inv_c = jnp.repeat(inv, c // g, axis=1)             # [N, C]
    mean_c = jnp.repeat(mean, c // g, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None]
    b = bias.astype(jnp.float32)[None] - mean_c * a
    return a, b


def _pick_hb(h: int, w: int, c: int, cout: int,
             budget: float = 30e6) -> int | None:
    """Largest row-block that divides H and fits the VMEM budget
    (double-buffered input scratch + im2col stage + output block + weights
    + residual)."""
    for hb in (8, 6, 5, 4, 3, 2):
        if h % hb:
            continue
        in_b = 2 * (hb + 2) * (w + 16) * c * 2
        stage_b = (hb + 2) * w * 3 * c * 2
        out_b = 2 * hb * w * cout * 2
        res_b = out_b                                   # worst case
        wts = 9 * c * cout * 2
        if in_b + stage_b + out_b + res_b + wts < budget:
            return hb
    return None


# ---------------------------------------------------------------------------
# fused GN+SiLU+conv3x3 kernel


def _conv_kernel(x_hbm, a_ref, b_ref, k_ref, bias_ref, *rest,
                 h, w, c, cout, hb, nh, has_res, want_stats):
    scratch, stage, sem = rest[-3], rest[-2], rest[-1]
    rest = rest[:-3]
    if has_res:
        res_ref, out_ref = rest[0], rest[1]
        stat_refs = rest[2:]
    else:
        out_ref = rest[0]
        stat_refs = rest[1:]

    n_i = pl.program_id(0)
    hb_i = pl.program_id(1)
    step = n_i * nh + hb_i
    nsteps = pl.num_programs(0) * nh
    wp = w + 16

    def issue(slot, n_, hb_, do):
        """Build the halo DMA for block (n_, hb_) and start or wait it.
        Variants (top/interior/bottom) must match between start and wait,
        so both paths rebuild the same descriptor from the block index."""
        if nh == 1:
            do(pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(0, hb)],
                scratch.at[slot, pl.ds(1, hb), pl.ds(8, w)],
                sem.at[slot]))
            return

        @pl.when(hb_ == 0)
        def _():
            do(pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(0, hb + 1)],
                scratch.at[slot, pl.ds(1, hb + 1), pl.ds(8, w)],
                sem.at[slot]))

        @pl.when(jnp.logical_and(hb_ > 0, hb_ < nh - 1))
        def _():
            do(pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(hb_ * hb - 1, hb + 2)],
                scratch.at[slot, pl.ds(0, hb + 2), pl.ds(8, w)],
                sem.at[slot]))

        @pl.when(hb_ == nh - 1)
        def _():
            do(pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(hb_ * hb - 1, hb + 1)],
                scratch.at[slot, pl.ds(0, hb + 1), pl.ds(8, w)],
                sem.at[slot]))

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        issue(slot, n_i, hb_i, lambda d: d.start())

    @pl.when(step + 1 < nsteps)
    def _():
        t = step + 1
        issue(nxt, t // nh, jax.lax.rem(t, nh), lambda d: d.start())

    issue(slot, n_i, hb_i, lambda d: d.wait())

    # W-edge zero padding (post-activation zeros: SAME conv pads AFTER
    # GN/SiLU in the reference, so the pad columns must stay zero through
    # the prologue — they are zeroed here and the prologue only touches the
    # data region)
    zcols = jnp.zeros((hb + 2, 8, c), scratch.dtype)
    scratch[slot, :, pl.ds(0, 8)] = zcols
    scratch[slot, :, pl.ds(w + 8, 8)] = zcols

    # prologue: y = silu(x * a + b), bf16, on the data region only
    av = a_ref[0, 0].astype(scratch.dtype)
    bv = b_ref[0, 0].astype(scratch.dtype)
    xv = scratch[slot, :, pl.ds(8, w)]
    yv = xv * av[None, None] + bv[None, None]
    # explicit exp-form sigmoid: jax.nn.sigmoid's logistic primitive hits a
    # Mosaic verification error on bf16 (f32 scalar broadcast into a bf16
    # vector)
    sig = 1.0 / (1.0 + jnp.exp(jnp.negative(yv)))
    scratch[slot, :, pl.ds(8, w)] = yv * sig

    # zero the H halo rows at the image boundary (post-activation zeros)
    zrow = jnp.zeros((1, wp, c), scratch.dtype)
    if nh == 1:
        scratch[slot, pl.ds(0, 1)] = zrow
        scratch[slot, pl.ds(hb + 1, 1)] = zrow
    else:
        @pl.when(hb_i == 0)
        def _():
            scratch[slot, pl.ds(0, 1)] = zrow

        @pl.when(hb_i == nh - 1)
        def _():
            scratch[slot, pl.ds(hb + 1, 1)] = zrow

    # im2col stage: one sublane-shifted copy per column tap, so every matmul
    # operand below is a lane/sublane-ALIGNED view. The per-(row, tap)
    # shifted-load spelling cost ~48 unaligned [W, C] relayouts per block
    # (~16 MB of VMEM moves at the 128-channel scale) and capped the kernel
    # at 69 TF/s; staging pays 3 copies per block instead.
    for dj in range(3):
        stage[:, :, pl.ds(dj * c, c)] = scratch[slot, :, pl.ds(7 + dj, w)]

    bias_v = bias_ref[0, 0]                              # [Cout] f32
    # one [Hb*W, 3C] @ [3C, Cout] matmul per row tap: the stage rows are
    # contiguous, so the row-dim merge is a free bitcast and the MXU streams
    # the whole block in three long passes (the per-output-row spelling
    # issued 24 short dots per block and capped at ~68 TF/s)
    acc = None
    for di in range(3):
        m = stage[pl.ds(di, hb)].reshape(hb * w, 3 * c)
        p = jax.lax.dot_general(
            m, k_ref[di], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    yb = (acc + bias_v[None]).astype(out_ref.dtype)
    if has_res:
        yb = yb + res_ref[0].reshape(hb * w, cout)
    out_ref[0] = yb.reshape(hb, w, cout)
    if want_stats:
        yf = yb.astype(jnp.float32)
        s_acc = jnp.sum(yf, axis=0)
        s2_acc = jnp.sum(jax.lax.square(yf), axis=0)

    if want_stats:
        sum_ref, sq_ref = stat_refs

        @pl.when(hb_i == 0)
        def _():
            sum_ref[0, 0] = s_acc
            sq_ref[0, 0] = s2_acc

        @pl.when(hb_i != 0)
        def _():
            sum_ref[0, 0] = sum_ref[0, 0] + s_acc
            sq_ref[0, 0] = sq_ref[0, 0] + s2_acc


def _conv3x3_pallas(x, a, b, kernel, bias, residual, want_stats, hb,
                    interpret):
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    nh = h // hb
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),            # x stays in HBM
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),    # a
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),    # b
        pl.BlockSpec((3, 3 * c, cout), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((1, 1, cout), lambda ni, hi: (0, 0, 0)),  # bias
    ]
    # [3, 3, C, Cout] -> [di, dj*C + c, Cout]: matches the stage's lane-dim
    # tap concatenation
    args = [x, a.reshape(n, 1, c), b.reshape(n, 1, c),
            kernel.reshape(3, 3 * c, cout),
            bias.reshape(1, 1, cout).astype(jnp.float32)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, hb, w, cout),
                                     lambda ni, hi: (ni, hi, 0, 0)))
        args.append(residual)
    out_shape = [jax.ShapeDtypeStruct((n, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, hb, w, cout), lambda ni, hi: (ni, hi, 0, 0))]
    if want_stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((n, 1, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, cout),
                                          lambda ni, hi: (ni, 0, 0)))

    kern = functools.partial(
        _conv_kernel, h=h, w=w, c=c, cout=cout, hb=hb, nh=nh,
        has_res=residual is not None, want_stats=want_stats)
    out = pl.pallas_call(
        kern,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, hb + 2, w + 16, c), x.dtype),
            pltpu.VMEM((hb + 2, w, 3 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * cout,
            bytes_accessed=(x.size + n * h * w * cout) * 2,
            transcendentals=n * h * w * c),
        interpret=interpret,
    )(*args)
    if want_stats:
        return out[0], (out[1].reshape(n, cout), out[2].reshape(n, cout))
    return out[0], None


def _conv3x3_xla(x, a, b, kernel, bias, residual, want_stats):
    """jnp reference/fallback with identical semantics (bf16 apply when x is
    bf16; taps accumulate fp32)."""
    y = x * a.astype(x.dtype)[:, None, None] + b.astype(x.dtype)[:, None, None]
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    out = (out + bias.astype(jnp.float32)).astype(x.dtype)
    if residual is not None:
        out = out + residual
    return out, (channel_stats(out) if want_stats else None)


def fused_gn_silu_conv3x3(x: jax.Array, gn_scale: jax.Array,
                          gn_bias: jax.Array, kernel: jax.Array,
                          bias: jax.Array, *,
                          stats: tuple[jax.Array, jax.Array] | None = None,
                          residual: jax.Array | None = None,
                          want_stats: bool = False,
                          num_groups: int = 32, eps: float = 1e-6,
                          interpret: bool = False):
    """GroupNorm(x) -> SiLU -> conv3x3 SAME (+bias) [+ residual], fused.

    x: [N, H, W, C]; kernel [3, 3, C, Cout] (fp32 param); returns
    (y [N, H, W, Cout], stats_of_y | None) where stats_of_y is the
    per-(n, channel) fp32 (sum, sumsq) of the OUTPUT — feed it to the next
    GN via `stats=` to keep statistics fused instead of re-reading y.
    """
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    if stats is None:
        stats = channel_stats(x)
    a, b = gn_coeffs(stats, h * w * (c // num_groups), gn_scale, gn_bias,
                     num_groups, eps)
    from .attention import _on_tpu
    hb = _pick_hb(h, w, c, cout)
    # dispatch rule (all measured on v5e, tools/bench_conv3x3.py vs the
    # in-model XLA fusions from tools/profile_vae.py): the kernel wins only
    # at 512-channel scales (19.7 ms vs ~22.9 = +15%, 124 TF/s); at C=128
    # XLA's conv engine is faster (23.4 ms vs ~36 — the kernel is VMEM-
    # traffic-bound around the MXU), at C=256 it's a tie. Keep XLA below 512.
    use_pallas = (hb is not None and c % 128 == 0 and cout % 128 == 0
                  and max(c, cout) >= 512
                  and w % 8 == 0 and (_on_tpu() or interpret))
    if not use_pallas:
        return _conv3x3_xla(x, a, b, kernel, bias, residual, want_stats)
    return _conv3x3_pallas(
        x, a, b, kernel.astype(x.dtype), bias, residual, want_stats, hb,
        interpret)


# ---------------------------------------------------------------------------
# 2x2 phase interleave


def _interleave_kernel(p00_ref, p01_ref, p10_ref, p11_ref, out_ref, *, hb):
    rows0 = []
    rows1 = []
    for r in range(hb):
        a = jnp.stack([p00_ref[0, r], p01_ref[0, r]], axis=1)
        rows0.append(a.reshape(-1, a.shape[-1]))        # [2W, C]
        bb = jnp.stack([p10_ref[0, r], p11_ref[0, r]], axis=1)
        rows1.append(bb.reshape(-1, bb.shape[-1]))
    for r in range(hb):
        out_ref[0, 2 * r] = rows0[r]
        out_ref[0, 2 * r + 1] = rows1[r]


def interleave2x2(p00: jax.Array, p01: jax.Array, p10: jax.Array,
                  p11: jax.Array, interpret: bool = False) -> jax.Array:
    """Phase recombination: out[:, 2i+r, 2j+s] = p_rs[:, i, j].

    One pass over the data; replaces XLA's pad/maximum interleave + layout
    copy + reshape chain (~4 full passes at the 720p decode scale).
    p_rs: [N, H, W, C] -> [N, 2H, 2W, C].
    """
    n, h, w, c = p00.shape
    from .attention import _on_tpu
    hb = 2 if h % 2 == 0 else 1
    if not ((_on_tpu() or interpret) and c % 128 == 0 and w % 8 == 0):
        t = jnp.stack([jnp.stack([p00, p01], axis=3),
                       jnp.stack([p10, p11], axis=3)], axis=2)
        return t.reshape(n, 2 * h, 2 * w, c)
    spec = pl.BlockSpec((1, hb, w, c), lambda ni, hi: (ni, hi, 0, 0))
    return pl.pallas_call(
        functools.partial(_interleave_kernel, hb=hb),
        grid=(n, h // hb),
        in_specs=[spec] * 4,
        out_specs=pl.BlockSpec((1, 2 * hb, 2 * w, c),
                               lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), p00.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=8 * p00.size * 2, transcendentals=0),
        interpret=interpret,
    )(p00, p01, p10, p11)
