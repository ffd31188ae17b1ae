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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B escape hatch: day-to-day VAE numbers drift across processes (CLAUDE.md),
# so old-vs-new comparisons must run in ONE process — flip this env var to
# route both kernels to their XLA fallbacks.
_DISABLE = os.environ.get('STAR_TPU_DISABLE_CONV3X3', '') == '1'


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
    # input-dtype output (fp32 MXU accumulation happens internally): asking
    # for an fp32 output made XLA materialize f32[9,720,1280,128] conv
    # results (1.9 GB each, ~23 ms/op) at the VAE decoder's 128ch scale
    # instead of fusing the bias+cast into the conv
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = out + bias.astype(x.dtype)
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
                          impl: str = 'auto',
                          interpret: bool = False):
    """GroupNorm(x) -> SiLU -> conv3x3 SAME (+bias) [+ residual], fused.

    x: [N, H, W, C]; kernel [3, 3, C, Cout] (fp32 param); returns
    (y [N, H, W, Cout], stats_of_y | None) where stats_of_y is the
    per-(n, channel) fp32 (sum, sumsq) of the OUTPUT — feed it to the next
    GN via `stats=` to keep statistics fused instead of re-reading y.

    impl: 'auto' picks by measured dispatch rules; 'xla' / 'direct' /
    'wino' force a path (bench A/B; 'wino' is the F(2x2,3x3) kernel).
    """
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    if stats is None:
        stats = channel_stats(x)
    a, b = gn_coeffs(stats, h * w * (c // num_groups), gn_scale, gn_bias,
                     num_groups, eps)
    from .attention import _on_tpu
    lanes_ok = (c % 128 == 0 and cout % 128 == 0 and w % 8 == 0
                and (_on_tpu() or interpret))
    if impl == 'wino':
        # 2-D Winograd F(2x2,3x3): measured SLOWER than XLA/direct at every
        # decoder scale (96/37/21 ms vs 23.4/22.4/19.4 at 128/256/512) —
        # the stride-2 W gather costs ~55 ms at the 128 scale alone
        # (STAR_TPU_WINO_NOGATHER A/B). Kept for the record; use 'winoh'.
        hbw = _pick_hb_wino(h, w, c, cout)
        if hbw is not None and lanes_ok:
            return _conv3x3_wino_pallas(
                x, a, b, kernel, bias, residual, want_stats, hbw, interpret)
    if impl in ('winoh', 'auto'):
        # H-Winograd dispatch rule (measured on v5e, scan-amortized):
        # beats every other path at C>=256 (256: 19.3 vs 22.4 XLA; 512:
        # 15.0 vs 19.4 direct, 162 TF/s; 1280@24x40: 5.06 vs 5.22 XLA) but
        # LOSES at C=128 (35.4 vs 23.4 — the wide-W 720p rows are
        # VMEM-traffic-bound and the F(4,3) transform adds VPU passes).
        pick = _pick_hb_winoh(h, w, c, cout)
        if (pick is not None and lanes_ok
                and (impl == 'winoh'
                     or (not _DISABLE and max(c, cout) >= 256))):
            return _conv3x3_winoh_pallas(
                x, a, b, kernel, bias, residual, want_stats, pick[0],
                pick[1], interpret)
        if impl == 'winoh':
            raise ValueError(f'winoh unsupported for shape {x.shape}')
    hb = _pick_hb(h, w, c, cout)
    # direct-kernel dispatch rule (measured on v5e): wins only at
    # 512-channel scales (+15%, 124 TF/s); at C=128 XLA's conv engine is
    # faster (the kernel is VMEM-traffic-bound around the MXU), C=256 a tie.
    # Reached only when the winoh tiling pick fails (h % 2 != 0).
    # C=Cout=128 routes through the direct kernel (r5). Standalone the XLA
    # conv engine wins at this scale (23.4 vs ~28 ms), but IN-GRAPH the XLA
    # route costs ~42 ms — the conv emits a {3,0,2,1} relayout, the threaded
    # channel_stats become a standalone convert_reduce+relayout pass
    # (~11 ms), and the GN apply is its own 8.5 ms pass (r5 VAE decoder
    # trace) — while the kernel folds all three. One-process decode A/B
    # (tools/ab_decode128.py): direct 756.1 ms vs XLA 816.1 at 9f 720p,
    # decode_batch=3. STAR_TPU_CONV3X3_DIRECT128=0 restores the XLA route
    # (trace-time kill switch for A/Bs).
    direct128 = (c == 128 and cout == 128 and os.environ.get(
        'STAR_TPU_CONV3X3_DIRECT128', '1') == '1')
    use_pallas = (impl == 'direct' or (
        impl == 'auto' and not _DISABLE and hb is not None and lanes_ok
        and (max(c, cout) >= 512 or direct128)))
    if not use_pallas or hb is None:
        return _conv3x3_xla(x, a, b, kernel, bias, residual, want_stats)
    return _conv3x3_pallas(
        x, a, b, kernel.astype(x.dtype), bias, residual, want_stats, hb,
        interpret)


# ---------------------------------------------------------------------------
# Winograd F(2x2, 3x3) variant: 2.25x fewer MXU MACs than the direct taps.
#
# Y = A^T [ (G g G^T) (.) (B^T d B) ] A per 4x4 input tile -> 2x2 output
# (Lavin & Gray 2015, public algorithm). The weight transform U = G g G^T
# happens OUTSIDE the kernel in fp32 (16 [C, Cout] planes); the data
# transform is 8 VPU adds per tile row computed from an even/odd column
# split staged ONCE per block, so every tap is a contiguous sublane-shifted
# view (a per-tile stride-2 gather would eat the MXU win).


_G_WINO = ((1.0, 0.0, 0.0), (0.5, 0.5, 0.5), (0.5, -0.5, 0.5),
           (0.0, 0.0, 1.0))


def winograd_weights(kernel: jax.Array) -> jax.Array:
    """[3, 3, C, Cout] fp32 -> U [16, C, Cout]: U[4i+k] = sum_ab G[i,a]
    G[k,b] g[a,b]. fp32 math, caller casts."""
    g = jnp.asarray(_G_WINO, jnp.float32)
    u = jnp.einsum('pa,qb,abio->pqio', g, g, kernel.astype(jnp.float32))
    c, cout = kernel.shape[2], kernel.shape[3]
    return u.reshape(16, c, cout)


# diagnostic: route the even/odd input split through a (semantically wrong)
# contiguous copy to measure what the stride-2 sublane gather costs
_WINO_NOGATHER = os.environ.get('STAR_TPU_WINO_NOGATHER', '') == '1'


def _wino_kernel(x_hbm, a_ref, b_ref, u_ref, bias_ref, *rest,
                 w, c, cout, hb, nh, has_res, want_stats):
    scratch, xe_s, xo_s, we_s, wo_s, sem = rest[-6:]
    rest = rest[:-6]
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
    wt = w // 2

    def issue(slot, n_, hb_, do):
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

    # W-edge zero pad (post-activation zeros, as in the direct kernel)
    zcols = jnp.zeros((hb + 2, 8, c), scratch.dtype)
    scratch[slot, :, pl.ds(0, 8)] = zcols
    scratch[slot, :, pl.ds(w + 8, 8)] = zcols

    # GN-apply + SiLU prologue on the data region
    av = a_ref[0, 0].astype(scratch.dtype)
    bv = b_ref[0, 0].astype(scratch.dtype)
    xv = scratch[slot, :, pl.ds(8, w)]
    yv = xv * av[None, None] + bv[None, None]
    sig = 1.0 / (1.0 + jnp.exp(jnp.negative(yv)))
    scratch[slot, :, pl.ds(8, w)] = yv * sig

    zrow = jnp.zeros((1, w + 16, c), scratch.dtype)
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

    # even/odd column split, once per block: xe[r, j] = x[2j] (j <= wt via
    # the zeroed right pad), xo[r, j] = x[2j-1] (j=0 reads the zeroed left
    # pad). Every Winograd tap below is a contiguous shifted view of these.
    if _WINO_NOGATHER:
        xe_s[...] = scratch[slot, :, pl.ds(0, wt + 1)]
        xo_s[...] = scratch[slot, :, pl.ds(4, wt + 1)]
    else:
        xe_s[...] = scratch[slot, :, pl.ds(8, w + 2)].reshape(
            hb + 2, wt + 1, 2, c)[:, :, 0]
        xo_s[...] = scratch[slot, :, pl.ds(7, w + 2)].reshape(
            hb + 2, wt + 1, 2, c)[:, :, 0]

    t_blk = hb // 2
    # W-transform per input row, staged by ROW PARITY so that every
    # H-direction combo below is a contiguous [T, wt, C] slice (tile t reads
    # rows 2t..2t+3 = even idx t, t+1 / odd idx t, t+1):
    #   taps e0=x[2j-1], e1=x[2j], e2=x[2j+1], e3=x[2j+2]
    #   w0=e0-e2, w1=e1+e2, w2=e2-e1, w3=e1-e3
    for rho in range(hb + 2):
        e1 = xe_s[rho, pl.ds(0, wt)]
        e3 = xe_s[rho, pl.ds(1, wt)]
        e0 = xo_s[rho, pl.ds(0, wt)]
        e2 = xo_s[rho, pl.ds(1, wt)]
        dst = we_s if rho % 2 == 0 else wo_s
        idx = rho // 2
        dst[0, idx] = e0 - e2
        dst[1, idx] = e1 + e2
        dst[2, idx] = e2 - e1
        dst[3, idx] = e1 - e3

    # H-transform (B^T over rows) + 16 gemms BATCHED over all H-tiles of
    # the block ([T*wt, C] operands — per-tile [wt, C] gemms ran the MXU at
    # ~10% and dominated the v1 kernel), accumulating the W-side A-transform
    # on the fly: even cols = P0+P1+P2, odd cols = P1-P2-P3.
    acc = [[None, None], [None, None]]                   # [r][col parity]
    for k in range(4):
        we0 = we_s[k, pl.ds(0, t_blk)].reshape(t_blk * wt, c)
        we1 = we_s[k, pl.ds(1, t_blk)].reshape(t_blk * wt, c)
        wo0 = wo_s[k, pl.ds(0, t_blk)].reshape(t_blk * wt, c)
        wo1 = wo_s[k, pl.ds(1, t_blk)].reshape(t_blk * wt, c)
        vs = (we0 - we1, wo0 + we1, we1 - wo0, wo0 - wo1)
        m = [jax.lax.dot_general(v, u_ref[4 * i + k], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             for i, v in enumerate(vs)]
        p0 = m[0] + m[1] + m[2]
        p1 = m[1] - m[2] - m[3]
        for r, p in ((0, p0), (1, p1)):
            if k < 3:
                acc[r][0] = p if acc[r][0] is None else acc[r][0] + p
            if k == 1:
                acc[r][1] = p
            elif k >= 2:
                acc[r][1] = acc[r][1] - p

    bias_v = bias_ref[0, 0]                              # [Cout] f32
    s_acc = None
    s2_acc = None
    for r in range(2):
        for cp in range(2):
            acc[r][cp] = acc[r][cp] + bias_v[None]
    for t in range(t_blk):
        for r in range(2):
            s0 = acc[r][0][t * wt:(t + 1) * wt]
            s1 = acc[r][1][t * wt:(t + 1) * wt]
            row = jnp.stack([s0, s1], axis=1).reshape(w, cout)
            rowb = row.astype(out_ref.dtype)
            if has_res:
                rowb = rowb + res_ref[0, 2 * t + r]
            out_ref[0, 2 * t + r] = rowb
            if want_stats:
                rf = rowb.astype(jnp.float32)
                rs = jnp.sum(rf, axis=0)
                rs2 = jnp.sum(jax.lax.square(rf), axis=0)
                s_acc = rs if s_acc is None else s_acc + rs
                s2_acc = rs2 if s2_acc is None else s2_acc + rs2

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


def _pick_hb_wino(h: int, w: int, c: int, cout: int,
                  budget: float = 45e6) -> int | None:
    """Largest even row-block fitting the scoped-VMEM stack limit (65.5M
    measured; model ratio ~1.13 as for _pick_hb_upsample)."""
    if w % 2:
        return None
    wt = w // 2
    for hb in (8, 6, 4, 2):
        if h % hb:
            continue
        t = hb // 2
        in_b = 2 * (hb + 2) * (w + 16) * c * 2
        eo_b = 2 * (hb + 2) * (wt + 1) * c * 2
        ws_b = 8 * (t + 1) * wt * c * 2
        out_b = 2 * hb * w * cout * 2
        res_b = out_b // 2
        wts = 16 * c * cout * 2
        live = 6 * t * wt * cout * 4 + 4 * t * wt * c * 2
        if in_b + eo_b + ws_b + out_b + res_b + wts + live < budget:
            return hb
    return None


def _conv3x3_wino_pallas(x, a, b, kernel, bias, residual, want_stats, hb,
                         interpret):
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    nh = h // hb
    u = winograd_weights(kernel).astype(x.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),
        pl.BlockSpec((16, c, cout), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((1, 1, cout), lambda ni, hi: (0, 0, 0)),
    ]
    args = [x, a.reshape(n, 1, c), b.reshape(n, 1, c), u,
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
        _wino_kernel, w=w, c=c, cout=cout, hb=hb, nh=nh,
        has_res=residual is not None, want_stats=want_stats)
    out = pl.pallas_call(
        kern,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, hb + 2, w + 16, c), x.dtype),
            pltpu.VMEM((hb + 2, w // 2 + 1, c), x.dtype),
            pltpu.VMEM((hb + 2, w // 2 + 1, c), x.dtype),
            pltpu.VMEM((4, hb // 2 + 1, w // 2, c), x.dtype),
            pltpu.VMEM((4, hb // 2 + 1, w // 2, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=80 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 4 * c * cout,
            bytes_accessed=(x.size + n * h * w * cout) * 2,
            transcendentals=n * h * w * c),
        interpret=interpret,
    )(*args)
    if want_stats:
        return out[0], (out[1].reshape(n, cout), out[2].reshape(n, cout))
    return out[0], None


# ---------------------------------------------------------------------------
# H-only 1-D Winograd (F(4,3) / F(2,3) along H, direct 3-tap along W).
#
# Why 1-D: H-tile row access is free on TPU (each row is its own tile set)
# while the 2-D variant's stride-2 W gather measured +55 ms at the 128
# scale (STAR_TPU_WINO_NOGATHER A/B) and its output interleave adds more.
# F(4,3) does 6 row-gemms per 4 output rows instead of 12 (2x fewer MXU
# MACs); the W taps reuse the direct kernel's staged-concat im2col.

_BT_H = {
    4: ((4, 0, -5, 0, 1, 0), (0, -4, -4, 1, 1, 0), (0, 4, -4, -1, 1, 0),
        (0, -2, -1, 2, 1, 0), (0, 2, -1, -2, 1, 0), (0, 4, 0, -5, 0, 1)),
    2: ((1, 0, -1, 0), (0, 1, 1, 0), (0, -1, 1, 0), (0, 1, 0, -1)),
}
_AT_H = {
    4: ((1, 1, 1, 1, 1, 0), (0, 1, -1, 2, -2, 0), (0, 1, 1, 4, 4, 0),
        (0, 1, -1, 8, -8, 1)),
    2: ((1, 1, 1, 0), (0, 1, -1, -1)),
}
_G_H = {
    4: ((0.25, 0, 0), (-1 / 6, -1 / 6, -1 / 6), (-1 / 6, 1 / 6, -1 / 6),
        (1 / 24, 1 / 12, 1 / 6), (1 / 24, -1 / 12, 1 / 6), (0, 0, 1)),
    2: _G_WINO,
}


def winograd_h_weights(kernel: jax.Array, m: int) -> jax.Array:
    """[3, 3, C, Cout] fp32 -> U [m+2, 3*C, Cout]: H dim G-transformed,
    W taps concatenated dj-major to match the staged-concat layout."""
    g = jnp.asarray(_G_H[m], jnp.float32)
    u = jnp.einsum('pa,abio->pbio', g, kernel.astype(jnp.float32))
    _, _, c, cout = kernel.shape
    return u.reshape(m + 2, 3 * c, cout)


def _winoh_kernel(x_hbm, a_ref, b_ref, u_ref, bias_ref, *rest,
                  w, c, cout, hb, nh, m, has_res, want_stats):
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

    def issue(slot, n_, hb_, do):
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

    zcols = jnp.zeros((hb + 2, 8, c), scratch.dtype)
    scratch[slot, :, pl.ds(0, 8)] = zcols
    scratch[slot, :, pl.ds(w + 8, 8)] = zcols

    av = a_ref[0, 0].astype(scratch.dtype)
    bv = b_ref[0, 0].astype(scratch.dtype)
    xv = scratch[slot, :, pl.ds(8, w)]
    yv = xv * av[None, None] + bv[None, None]
    sig = 1.0 / (1.0 + jnp.exp(jnp.negative(yv)))
    scratch[slot, :, pl.ds(8, w)] = yv * sig

    zrow = jnp.zeros((1, w + 16, c), scratch.dtype)
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

    bt = _BT_H[m]
    at = _AT_H[m]
    bias_v = bias_ref[0, 0]                              # [Cout] f32
    s_acc = None
    s2_acc = None
    for t in range(hb // m):
        rows = [scratch[slot, m * t + k] for k in range(m + 2)]
        ys = [None] * m
        for i in range(m + 2):
            v = None
            for k, coef in enumerate(bt[i]):
                if coef == 0:
                    continue
                term = rows[k] if coef == 1 else rows[k] * float(coef)
                v = term if v is None else v + term
            sl = i % 2
            for dj in range(3):
                stage[sl, :, pl.ds(dj * c, c)] = v[7 + dj:7 + dj + w]
            mi = jax.lax.dot_general(
                stage[sl], u_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for y in range(m):
                coef = at[y][i]
                if coef == 0:
                    continue
                term = mi if coef == 1 else mi * float(coef)
                ys[y] = term if ys[y] is None else ys[y] + term
        for y in range(m):
            rowb = (ys[y] + bias_v[None]).astype(out_ref.dtype)
            if has_res:
                rowb = rowb + res_ref[0, m * t + y]
            out_ref[0, m * t + y] = rowb
            if want_stats:
                rf = rowb.astype(jnp.float32)
                rs = jnp.sum(rf, axis=0)
                rs2 = jnp.sum(jax.lax.square(rf), axis=0)
                s_acc = rs if s_acc is None else s_acc + rs
                s2_acc = rs2 if s2_acc is None else s2_acc + rs2

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


def _pick_hb_winoh(h: int, w: int, c: int, cout: int,
                   budget: float = 45e6) -> tuple[int, int] | None:
    """-> (hb, m): largest F(4,3)-tileable row block, else F(2,3)."""
    for m in (4, 2):
        if h % m:
            continue
        for hb in (8, 4) if m == 4 else (8, 6, 4, 2):
            if h % hb or hb % m:
                continue
            in_b = 2 * (hb + 2) * (w + 16) * c * 2
            stage_b = 2 * w * 3 * c * 2
            wts = (m + 2) * 3 * c * cout * 2
            out_b = 2 * hb * w * cout * 2
            res_b = out_b
            live = (m + 1) * w * cout * 4 + 2 * (w + 16) * c * 2
            if in_b + stage_b + wts + out_b + res_b + live < budget:
                return hb, m
    return None


def _conv3x3_winoh_pallas(x, a, b, kernel, bias, residual, want_stats,
                          hb, m, interpret):
    n, h, w, c = x.shape
    cout = kernel.shape[-1]
    nh = h // hb
    u = winograd_h_weights(kernel, m).astype(x.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),
        pl.BlockSpec((1, 1, c), lambda ni, hi: (ni, 0, 0)),
        pl.BlockSpec((m + 2, 3 * c, cout), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((1, 1, cout), lambda ni, hi: (0, 0, 0)),
    ]
    args = [x, a.reshape(n, 1, c), b.reshape(n, 1, c), u,
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
        _winoh_kernel, w=w, c=c, cout=cout, hb=hb, nh=nh, m=m,
        has_res=residual is not None, want_stats=want_stats)
    out = pl.pallas_call(
        kern,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, hb + 2, w + 16, c), x.dtype),
            pltpu.VMEM((2, w, 3 * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * cout * (m + 2) // (3 * m),
            bytes_accessed=(x.size + n * h * w * cout) * 2,
            transcendentals=n * h * w * c),
        interpret=interpret,
    )(*args)
    if want_stats:
        return out[0], (out[1].reshape(n, cout), out[2].reshape(n, cout))
    return out[0], None


# ---------------------------------------------------------------------------
# fused phase-decomposed 2x upsample-conv (4 phase 2x2 convs + interleave)


def _upsample_kernel(x_hbm, k_ref, bias_ref, out_ref, *rest,
                     w, c, cout, hb, nh, want_stats):
    scratch, stage, sem = rest[-3], rest[-2], rest[-1]
    stat_refs = rest[:-3]

    n_i = pl.program_id(0)
    hb_i = pl.program_id(1)
    step = n_i * nh + hb_i
    nsteps = pl.num_programs(0) * nh

    def issue(slot, n_, hb_, do):
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

    # raw zero padding (no activation prologue here: diffusers Upsample2D is
    # nearest + conv with SAME zero padding on the upsampled grid, which the
    # phase decomposition sees as zero halo rows/cols of the SMALL grid)
    zcols = jnp.zeros((hb + 2, 8, c), scratch.dtype)
    scratch[slot, :, pl.ds(0, 8)] = zcols
    scratch[slot, :, pl.ds(w + 8, 8)] = zcols
    zrow = jnp.zeros((1, w + 16, c), scratch.dtype)
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

    for dj in range(3):
        stage[:, :, pl.ds(dj * c, c)] = scratch[slot, :, pl.ds(7 + dj, w)]

    bias_v = bias_ref[0, 0]
    # phase (r, s) output rows 2i+r, cols 2j+s read the fixed 2x2 window
    # x[i+p-(1-r), j+q-(1-s)]; in stage terms that is row taps {r, r+1} and
    # the contiguous lane range [s*C, (s+2)*C) — two depth-2C matmuls per
    # phase, 16 MAC taps per 4 output pixels total (2.25x fewer FLOPs than
    # the 3x3 on the upsampled grid)
    phases = []
    for r in (0, 1):
        for s in (0, 1):
            acc = None
            for t in (0, 1):
                m = stage[pl.ds(r + t, hb), :, pl.ds(s * c, 2 * c)]
                p = jax.lax.dot_general(
                    m.reshape(hb * w, 2 * c), k_ref[2 * r + s, t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            phases.append((acc + bias_v[None]).astype(out_ref.dtype)
                          .reshape(hb, w, cout))

    s_acc = None
    s2_acc = None
    for i in range(hb):
        r0 = jnp.stack([phases[0][i], phases[1][i]], axis=1)
        r0 = r0.reshape(2 * w, cout)
        r1 = jnp.stack([phases[2][i], phases[3][i]], axis=1)
        r1 = r1.reshape(2 * w, cout)
        out_ref[0, 2 * i] = r0
        out_ref[0, 2 * i + 1] = r1
        if want_stats:
            for v in (r0, r1):
                vf = v.astype(jnp.float32)
                rs = jnp.sum(vf, axis=0)
                rs2 = jnp.sum(jax.lax.square(vf), axis=0)
                s_acc = rs if s_acc is None else s_acc + rs
                s2_acc = rs2 if s2_acc is None else s2_acc + rs2

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


def _pick_hb_upsample(h: int, w: int, c: int, cout: int,
                      budget: float = 58e6) -> int | None:
    """Largest row-block whose scoped-VMEM footprint fits. Byte model
    calibrated on chip: double-buffered input scratch + 3C stage + double-
    buffered output block + weights + the 4 phase accumulators (fp32 during
    the matmuls, bf16 while interleaving) — at (360, 640, 256)/hb=8 Mosaic
    measured 78.5M where this model says 71M (ratio ~1.11), and the real
    scoped-vmem stack limit is 65.5M regardless of the 100M
    vmem_limit_bytes request; budget 58M model-bytes keeps measured under
    that (hb=6 at the 256 scale, 5-6 at the 512 scales)."""
    for hb in (8, 6, 5, 4, 3, 2):
        if h % hb:
            continue
        in_b = 2 * (hb + 2) * (w + 16) * c * 2
        stage_b = (hb + 2) * w * 3 * c * 2
        out_b = 2 * (2 * hb) * (2 * w) * cout * 2
        wts = 16 * c * cout * 2
        phase_b = 4 * hb * w * cout * 6
        if in_b + stage_b + out_b + wts + phase_b < budget:
            return hb
    return None


def upsample_conv2x_fused(x: jax.Array, phase_kernels: jax.Array,
                          bias: jax.Array, want_stats: bool = False,
                          interpret: bool = False):
    """Fused nearest-2x + 3x3 conv: the four phase 2x2 convs AND the phase
    interleave in one Pallas pass.

    x: [N, H, W, C]; phase_kernels: [4, 2, 2, C, Cout] bf16/f32 — the
    tap-sums K_rs of ops/upsample_conv (phase index 2r+s); bias [Cout].
    Returns [N, 2H, 2W, Cout] (+ per-(n, c) fp32 (sum, sumsq)).

    Why one kernel: handing the four phase conv outputs to a separate
    interleave custom call forced XLA to materialize them as fp32 temps in
    its preferred N-second-minor conv layout (3.5 GB each at the 720p
    decode scale — OOM), and the XLA stack/pad/maximum interleave spelling
    costs ~4 extra full passes.
    """
    n, h, w, c = x.shape
    cout = phase_kernels.shape[-1]
    hb = _pick_hb_upsample(h, w, c, cout)
    assert hb is not None and c % 128 == 0 and cout % 128 == 0 and w % 8 == 0
    k2 = phase_kernels.reshape(4, 2, 2 * c, cout).astype(x.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((4, 2, 2 * c, cout), lambda ni, hi: (0, 0, 0, 0)),
        pl.BlockSpec((1, 1, cout), lambda ni, hi: (0, 0, 0)),
    ]
    args = [x, k2, bias.reshape(1, 1, cout).astype(jnp.float32)]
    out_shape = [jax.ShapeDtypeStruct((n, 2 * h, 2 * w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, 2 * hb, 2 * w, cout),
                              lambda ni, hi: (ni, hi, 0, 0))]
    if want_stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((n, 1, cout), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, cout),
                                          lambda ni, hi: (ni, 0, 0)))
    res = pl.pallas_call(
        functools.partial(_upsample_kernel, w=w, c=c, cout=cout, hb=hb,
                          nh=h // hb, want_stats=want_stats),
        grid=(n, h // hb),
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
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (2 * h) * (2 * w) * 4 * c * cout,
            bytes_accessed=(x.size + 4 * n * h * w * cout) * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    if want_stats:
        return res[0], (res[1].reshape(n, cout), res[2].reshape(n, cout))
    return res[0], None


# ---------------------------------------------------------------------------
# 2x2 phase interleave


def _interleave_kernel(p00_ref, p01_ref, p10_ref, p11_ref, out_ref, *rest,
                       hb, want_stats):
    hb_i = pl.program_id(1)
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
    if want_stats:
        # stats computed here (the block is already in VMEM) rather than as
        # per-phase jnp reductions: a reduce on the phase conv outputs stops
        # XLA from output-fusing their fp32->bf16 convert, which materialized
        # 4x 3.5GB fp32 phase temps and OOM'd the 9-frame 720p decode
        sum_ref, sq_ref = rest
        s = None
        s2 = None
        for rows in (rows0, rows1):
            for v in rows:
                vf = v.astype(jnp.float32)
                rs = jnp.sum(vf, axis=0)
                rs2 = jnp.sum(jax.lax.square(vf), axis=0)
                s = rs if s is None else s + rs
                s2 = rs2 if s2 is None else s2 + rs2

        @pl.when(hb_i == 0)
        def _():
            sum_ref[0, 0] = s
            sq_ref[0, 0] = s2

        @pl.when(hb_i != 0)
        def _():
            sum_ref[0, 0] = sum_ref[0, 0] + s
            sq_ref[0, 0] = sq_ref[0, 0] + s2


def interleave2x2(p00: jax.Array, p01: jax.Array, p10: jax.Array,
                  p11: jax.Array, want_stats: bool = False,
                  interpret: bool = False):
    """Phase recombination: out[:, 2i+r, 2j+s] = p_rs[:, i, j].

    One pass over the data; replaces XLA's pad/maximum interleave + layout
    copy + reshape chain (~4 full passes at the 720p decode scale): 35.2 vs
    71.0 ms at the 360->720 256ch scale (v5e, tools/bench_conv3x3.py).
    p_rs: [N, H, W, C] -> [N, 2H, 2W, C] (+ per-(n, c) fp32 (sum, sumsq)
    of the output when want_stats).
    """
    n, h, w, c = p00.shape
    from .attention import _on_tpu
    hb = 2 if h % 2 == 0 else 1
    if _DISABLE or not ((_on_tpu() or interpret) and c % 128 == 0
                        and w % 8 == 0):
        t = jnp.stack([jnp.stack([p00, p01], axis=3),
                       jnp.stack([p10, p11], axis=3)], axis=2)
        out = t.reshape(n, 2 * h, 2 * w, c)
        return (out, channel_stats(out)) if want_stats else out
    spec = pl.BlockSpec((1, hb, w, c), lambda ni, hi: (ni, hi, 0, 0))
    out_shape = [jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), p00.dtype)]
    out_specs = [pl.BlockSpec((1, 2 * hb, 2 * w, c),
                              lambda ni, hi: (ni, hi, 0, 0))]
    if want_stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((n, 1, c), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, c),
                                          lambda ni, hi: (ni, 0, 0)))
    res = pl.pallas_call(
        functools.partial(_interleave_kernel, hb=hb, want_stats=want_stats),
        grid=(n, h // hb),
        in_specs=[spec] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=8 * p00.size * 2, transcendentals=0),
        interpret=interpret,
    )(p00, p01, p10, p11)
    if want_stats:
        return res[0], (res[1].reshape(n, c), res[2].reshape(n, c))
    return res[0]
