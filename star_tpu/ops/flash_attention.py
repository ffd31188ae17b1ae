"""Flash attention for TPU (Pallas), forward pass.

Replaces xformers.memory_efficient_attention (unet_v2v.py:179-185) on the hot
spatial-attention shapes: at 720p-padded latents the per-frame sequence is
90*160 = 14.4k tokens (and larger above 720p), where materializing the
[S, S] logits matrix in HBM is impossible — the online-softmax streaming
kernel below keeps everything in VMEM.

Layout: q [B, Sq, H, D], k/v [B, Sk, H, D] -> out [B, Sq, H, D]
(same contract as ops.attention.dot_product_attention). Softmax statistics
and the accumulator are fp32 regardless of input dtype.

Grid: (B*H, Sq/bq, Sk/bk); the k dimension is the innermost (sequential on
TPU), carrying (m, l, acc) in VMEM scratch across iterations — the canonical
flash-attention recurrence. Ragged Sk is handled with an in-kernel column
mask on the last k block; ragged Sq by padding (padded rows are sliced off;
their l=0 division yields NaNs that never escape the slice).

Backward: Pallas recompute kernel (_flash_bwd_kernel) — the forward saves the
softmax denominators (fixed-reference softmax has no row max to save), the
backward recomputes p = exp2(qs k^T) tile by tile and accumulates dq in a
resident full-sequence fp32 block, dk/dv per key block. The [S, S] logits
never hit HBM, so 32-frame 720p training fits (the round-1 XLA fallback
materialized them).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PACKED_VMEM_Q_BUDGET = 368640  # bq cap numerator for whole-row packed
#                     blocks (lane > 128): bq <= budget/lane rounded to 16.
#                     368640 = 1152 q rows at lane 320 — swept safe; raising
#                     it risks the 16MB scoped-vmem limit (tools/sweep_flash).

def _packed_q_budget() -> int:
    """Sweep override (tools/sweep_flash_packed.py): STAR_FLASH_PACKED_BQ_BUDGET
    raises/lowers the whole-row bq cap. Values outside [64*128, 16MB/2] are
    certainly wrong (either no legal block or guaranteed scoped-vmem OOM)."""
    import os
    raw = os.environ.get('STAR_FLASH_PACKED_BQ_BUDGET')
    if not raw:
        return _PACKED_VMEM_Q_BUDGET
    val = int(raw)
    if not 64 * 128 <= val <= 8 * 1024 * 1024:
        raise ValueError(
            f'STAR_FLASH_PACKED_BQ_BUDGET={val} outside sane range '
            f'[{64 * 128}, {8 * 1024 * 1024}]')
    return val

DEFAULT_BQ = 2880   # swept on v5e at seq 14400/d 64 (tools/sweep_flash.py):
DEFAULT_BK = 960    # r2 sweep: (2880,960) 70.1ms < (2880,720) 71.3 <
#                     (1440,1440) 72.6 < (1024,1024)+pad 90.5 per call; the
#                     tall q block amortizes the finalize transpose, divisor
#                     blocks kill the 14400->15360 / 3680->4096 pad copies.
#                     (2880,1440)/(1440,2880) blow the scoped-vmem limit.


def _divisor_block(s: int, target: int) -> int | None:
    """Largest multiple of 16 that divides s, within [target/2, target]."""
    for cand in range(target - target % 16, target // 2 - 1, -16):
        if cand > 0 and s % cand == 0:
            return cand
    return None


def _pick_block(s: int, target: int) -> int:
    """Block size near `target`: an exact divisor of s when one exists, else
    the multiple of 16 in [target/2, target] minimizing the pad to the next
    block multiple (ties -> larger block). Naively padding s up to a
    multiple of the raw target wastes real MXU work — the CogVideoX seq
    9676 padded to 11520x10560 (23% of the attention FLOPs) under the old
    rule; this picks 1936/880-style blocks that pad 9676 -> 9680."""
    exact = _divisor_block(s, target)
    if exact:
        return exact
    lo = max(16, (target // 2) // 16 * 16)
    cands = range(lo, target + 1, 16)
    return min(cands, key=lambda b: (-(-s // b) * b - s, -b))


def _flash_kernel(*refs, scale: float, masked: bool, fixed_ref: bool,
                  with_l: bool = False, mask_start: int = 0):
    l_ref = m_scr = l_scr = None
    if masked:
        mask_ref, q_ref, k_ref, v_ref, *outs = refs
    else:
        q_ref, k_ref, v_ref, *outs = refs
    if with_l:
        o_ref, l_ref, *scr = outs
    else:
        o_ref, *scr = outs
    if fixed_ref:
        acc_scr, = scr      # [d+1, bq] transposed accumulator (+l row)
    else:
        m_scr, l_scr, acc_scr = scr
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        if not fixed_ref:
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # [bq, d]
    k = k_ref[0]                                   # [bk, d]
    v = v_ref[0]                                   # [bk, d]

    if fixed_ref:
        # fixed-reference softmax: exp2 around 0 instead of the running max.
        # fp32 exp2 is finite up to 2^127, so any log2-logit <= 120 is exact
        # without rescaling; the clamp only binds for |logits| > 120/log2(e)
        # ~ 83 — beyond what a sane attention produces (and beyond what fp16
        # references survive). Removes the max-reduce, the alpha pass and the
        # accumulator rescale — the kernel's VPU bottleneck.
        #
        # TRANSPOSED-PV layout: logits are computed as s^T = k q^T so the
        # p@v contraction runs as dot(v_ext, p^T) over the key dim — full
        # 128-lane output (bq) instead of d+1=65 of 128 lanes. The single
        # [d, bq] -> [bq, d] transpose happens once per q block at finalize,
        # amortized over all n_k visits. (q is pre-scaled by scale*log2(e):
        # logits live in log2 space so the softmax is one exp2.)
        d = v.shape[-1]

        def _body(use_mask: bool):
            s_t = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if use_mask:
                # padded key ROWS get a -inf additive bias (table stored
                # transposed: [skv_pad, 8], sublane-aligned)
                s_t2 = s_t + mask_ref[:, :1]
            else:
                s_t2 = s_t
            p_t = jnp.exp2(jnp.minimum(s_t2, 120.0))   # [bk, bq] fp32
            ones_col = jnp.ones((v.shape[0], 1), v.dtype)
            v_ext = jnp.concatenate([v, ones_col], axis=1)    # [bk, d+1]
            out_ext_t = jax.lax.dot_general(v_ext, p_t.astype(v.dtype),
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            acc_scr[:] += out_ext_t                    # [d+1, bq]

        if masked and mask_start > 0:
            # the additive bias is a full VPU pass over the logits tile;
            # only blocks containing dead key rows need it
            @pl.when(j >= mask_start)
            def _masked_blocks():
                _body(True)

            @pl.when(j < mask_start)
            def _clean_blocks():
                _body(False)
        else:
            _body(masked)
    else:
        # running-max online softmax (reference semantics fallback)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            s = s + mask_ref[:, 0][None, :]
        m_prev = m_scr[:, :1]                      # [bq, 1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)                    # [bq, bk] fp32
        alpha = jnp.exp2(m_prev - m_new)           # [bq, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc_scr[:] * alpha
        acc = acc + jax.lax.dot_general(p.astype(v.dtype), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        acc_scr[:] = acc
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_k - 1)
    def _finalize():
        # guard fully-underflowed rows (all log2-logits < -126): weights sum
        # to 0 there; emit 0 instead of NaN
        if fixed_ref:
            d = v.shape[-1]
            denom_t = jnp.maximum(acc_scr[d:d + 1, :], 1e-30)   # [1, bq]
            o_ref[0] = (acc_scr[:d, :] / denom_t).T.astype(o_ref.dtype)
            if with_l:
                # softmax denominators for the backward kernel: [BH, S, 8]
                # with a statically block-mapped (1, bq, 8) store — lane dim
                # equal to the array dim satisfies the tiling rule for any
                # bq. Only materialized under differentiation (training).
                l_ref[0] = jnp.broadcast_to(denom_t.T, (q.shape[0], 8))
        else:
            denom = jnp.maximum(l_scr[:, :1], 1e-30)
            o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)
            if with_l:
                l_ref[0] = jnp.broadcast_to(denom, (denom.shape[0], 8))


def _flash_fwd(q3: jax.Array, k3: jax.Array, v3: jax.Array, scale: float,
               bq: int, bk: int, interpret: bool,
               fixed_ref: bool = True, with_l: bool = False):
    """q3/k3/v3: [BH, S, D] -> out [BH, S, D] (+ softmax denominators
    [BH, S] fp32 when with_l, for the Pallas backward)."""
    bh, sq, d = q3.shape
    skv = k3.shape[1]
    # fold scale * log2(e) into q once: the kernel's softmax runs in log2
    # space (exp2); fp32 scale on bf16 data rounds once, like the
    # reference's in-attention multiply
    q3 = (q3.astype(jnp.float32) * (scale * 1.4426950408889634)).astype(q3.dtype)
    sq_pad = -(-sq // bq) * bq
    skv_pad = -(-skv // bk) * bk
    if sq_pad != sq:
        q3 = jnp.pad(q3, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        k3 = jnp.pad(k3, ((0, 0), (0, skv_pad - skv), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, skv_pad - skv), (0, 0)))

    masked = skv_pad != skv
    n_k = skv_pad // bk

    grid = (bh, sq_pad // bq, n_k)
    kernel = functools.partial(_flash_kernel, scale=scale, masked=masked,
                               fixed_ref=fixed_ref, with_l=with_l,
                               mask_start=skv // bk if masked else 0)
    flops = 4 * bh * sq_pad * skv_pad * d
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
    ]
    inputs = [q3, k3, v3]
    out_specs = pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, sq_pad, d), q3.dtype)
    if with_l:
        out_specs = (out_specs,
                     pl.BlockSpec((1, bq, 8), lambda b, i, j: (b, i, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bh, sq_pad, 8), jnp.float32))
    if masked:
        # additive mask table: 0 for valid key rows, -inf on the pad tail;
        # stored transposed [skv_pad, 8] (keys on sublanes, matching the
        # transposed logits). Only materialized when padding is needed —
        # the hot 720p shape (S=14400) uses divisor blocks and skips this.
        rows = np.arange(skv_pad)[:, None]
        mask_tab = jnp.asarray(
            np.broadcast_to(np.where(rows < skv, 0.0, -np.inf),
                            (skv_pad, 8)), jnp.float32)
        in_specs.insert(0, pl.BlockSpec((bk, 8), lambda b, i, j: (j, 0)))
        inputs.insert(0, mask_tab)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((d + 1, bq), jnp.float32)]   # acc^T with l row
            if fixed_ref else [
                pltpu.VMEM((bq, 128), jnp.float32),  # m
                pltpu.VMEM((bq, 128), jnp.float32),  # l
                pltpu.VMEM((bq, d), jnp.float32),    # acc
            ]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q3.size + k3.size + v3.size) * 2 + q3.size * 2,
            transcendentals=bh * sq_pad * skv_pad),
        interpret=interpret,
    )(*inputs)
    if with_l:
        out, l = out
        return out[:, :sq], l[:, :sq, 0]
    return out[:, :sq]


def _flash_packed_kernel(*refs, d: int, masked: bool, exp_bf16: bool,
                         mask_start: int = 0):
    """Head-packed natural-layout flash forward.

    Blocks carry L = hpb*d lanes (hpb heads side by side, exactly as they
    sit in the [B, S, H*D] projection output); heads are processed
    sequentially in-kernel from static 64-lane slices, so the [B,S,H,D] ->
    [B,H,S,D] HBM relayout + pad that fed the unpacked kernel (23+30 ms per
    tensor per step on the CogVideoX trace) never exists.

    mask_start: first kv-block index containing a dead (>= kv_valid) row.
    Blocks before it take the mask-free body — the additive bias is a full
    VPU pass over the logits tile, and for a 4-row tail pad (CogVideoX
    9676->9680) only the last of 11 blocks actually needs it.
    """
    if masked:
        mask_ref, q_ref, k_ref, v_ref, o_ref, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, acc_scr = refs
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q2 = q_ref[0]                                  # [bq, L]
    k2 = k_ref[0]
    v2 = v_ref[0]
    hpb = q2.shape[-1] // d
    ones_col = jnp.ones((v2.shape[0], 1), v2.dtype)

    def _body(use_mask: bool):
        for hi in range(hpb):
            sl = slice(hi * d, (hi + 1) * d)
            s_t = jax.lax.dot_general(k2[:, sl], q2[:, sl],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if use_mask:
                s_t = s_t + mask_ref[:, :1]
            if exp_bf16:
                # clamp+convert fold into the matmul epilogue; exp2 runs on
                # packed bf16 vregs (2x VPU rate). The pv matmul consumed
                # bf16 probs either way — this only moves the rounding
                # before the exp instead of after (comparable error, see
                # test tolerance).
                p_t = jnp.exp2(jnp.minimum(s_t, 120.0).astype(jnp.bfloat16))
            else:
                p_t = jnp.exp2(jnp.minimum(s_t, 120.0)).astype(v2.dtype)
            v_ext = jnp.concatenate([v2[:, sl], ones_col], axis=1)
            acc_scr[hi] += jax.lax.dot_general(
                v_ext, p_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    if masked and mask_start > 0:
        @pl.when(j >= mask_start)
        def _masked_blocks():
            _body(True)

        @pl.when(j < mask_start)
        def _clean_blocks():
            _body(False)
    else:
        _body(masked)

    @pl.when(j == n_k - 1)
    def _finalize():
        outs = []
        for hi in range(hpb):
            denom_t = jnp.maximum(acc_scr[hi, d:d + 1, :], 1e-30)
            outs.append((acc_scr[hi, :d, :] / denom_t).T)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _packed_fwd_impl(qn, kn, vn, num_heads: int, scale: float, bq: int,
                     bk: int, interpret: bool, exp_bf16: bool,
                     kv_valid: int | None = None, prescaled: bool = False):
    """qn/kn/vn: [B, S, H*D] natural layout -> out [B, S, H*D].

    kv_valid: number of real key rows (< S when the caller carried dead
    pad rows through the projection, e.g. CogVideoX's 9676 -> 9680); the
    tail gets a -inf additive bias so it never receives weight.
    prescaled: q already carries scale*log2(e) (e.g. folded into a fused
    LN prologue) — skip the fold pass here.
    """
    b, sq, hd_total = qn.shape
    skv = kn.shape[1]
    d = hd_total // num_heads
    # 128-lane head-pair blocks when the channel count allows; otherwise
    # whole-row blocks (lane == hd_total is always a legal Mosaic block on
    # the minor dim) with ALL heads processed sequentially in-kernel — this
    # is what routes the UNet's odd-head C=320 scale (5x d=64) through the
    # packed kernel instead of the head-split relayout copies (~0.7 ms per
    # [16,72000,64] tensor per call in the r4b trace).
    lane = 128 if hd_total % 128 == 0 and 128 % d == 0 else hd_total
    assert hd_total % lane == 0 and lane % d == 0, (hd_total, d)
    hp = hd_total // lane
    if lane > 128:
        # cap the q block so the VMEM footprint (double-buffered q/k/v/out
        # rows at `lane` width + the [hpb, d+1, bq] accumulator + the
        # [bk, bq] fp32 logits temp) stays inside the 16MB scoped limit
        bq = min(bq, max(384, _packed_q_budget() // lane // 16 * 16))
    if not prescaled:
        qn = (qn.astype(jnp.float32) * (scale * LOG2E)).astype(qn.dtype)

    bq_eff = _pick_block(sq, min(bq, -(-sq // 16) * 16))
    bk_eff = _pick_block(skv, min(bk, -(-skv // 128) * 128))
    sq_pad = -(-sq // bq_eff) * bq_eff
    skv_pad = -(-skv // bk_eff) * bk_eff
    if sq_pad != sq:
        qn = jnp.pad(qn, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        kn = jnp.pad(kn, ((0, 0), (0, skv_pad - skv), (0, 0)))
        vn = jnp.pad(vn, ((0, 0), (0, skv_pad - skv), (0, 0)))
    valid = min(kv_valid, skv) if kv_valid is not None else skv
    masked = valid != skv_pad
    n_k = skv_pad // bk_eff

    grid = (b * hp, sq_pad // bq_eff, n_k)
    kernel = functools.partial(_flash_packed_kernel, d=d, masked=masked,
                               exp_bf16=exp_bf16,
                               mask_start=valid // bk_eff if masked else 0)
    in_specs = [
        pl.BlockSpec((1, bq_eff, lane), lambda g, i, j: (g // hp, i, g % hp)),
        pl.BlockSpec((1, bk_eff, lane), lambda g, i, j: (g // hp, j, g % hp)),
        pl.BlockSpec((1, bk_eff, lane), lambda g, i, j: (g // hp, j, g % hp)),
    ]
    inputs = [qn, kn, vn]
    if masked:
        rows = np.arange(skv_pad)[:, None]
        mask_tab = jnp.asarray(
            np.broadcast_to(np.where(rows < valid, 0.0, -np.inf),
                            (skv_pad, 8)), jnp.float32)
        in_specs.insert(0, pl.BlockSpec((bk_eff, 8), lambda g, i, j: (j, 0)))
        inputs.insert(0, mask_tab)
    hpb = lane // d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq_eff, lane),
                               lambda g, i, j: (g // hp, i, g % hp)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, hd_total), qn.dtype),
        scratch_shapes=[pltpu.VMEM((hpb, d + 1, bq_eff), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hp * hpb * sq_pad * skv_pad * d,
            bytes_accessed=(qn.size + kn.size + vn.size) * 2 + qn.size * 2,
            transcendentals=b * hp * hpb * sq_pad * skv_pad),
        interpret=interpret,
    )(*inputs)
    return out[:, :sq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def flash_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int, scale: float | None = None,
                           bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK,
                           interpret: bool = False, exp_bf16: bool = False,
                           kv_valid: int | None = None,
                           prescaled: bool = False) -> jax.Array:
    """Natural-layout flash attention: q/k/v [B, S, H*D] -> [B, S, H*D].

    No head transpose on either side — the projection output feeds the
    kernel directly and the kernel emits the layout the out-projection
    wants. Requires (H*D) % 128 == 0 and D | 128 (CogVideoX: 48x64;
    UNet 640/1280ch scales: 10/20x64). Training gradients take the
    unpacked recompute backward (correctness path; inference never
    differentiates)."""
    d = q.shape[-1] // num_heads
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    return _packed_fwd_impl(q, k, v, num_heads, s, bq, bk, interpret,
                            exp_bf16, kv_valid, prescaled)


def _packed_fwd(q, k, v, num_heads, scale, bq, bk, interpret, exp_bf16,
                kv_valid, prescaled=False):
    b, sq, hd_total = q.shape
    skv = k.shape[1]
    d = hd_total // num_heads
    # prescaled q carries scale*log2e already: gradients wrt the prescaled
    # input are consistent with an effective scale of ln2
    s_eff = LN2 if prescaled else scale
    to4 = lambda t: t.reshape(t.shape[0], t.shape[1], num_heads, d)
    if kv_valid is not None and kv_valid < skv:
        k4, v4 = to4(k[:, :kv_valid]), to4(v[:, :kv_valid])
    else:
        k4, v4 = to4(k), to4(v)
    out4, res = _fwd(to4(q), k4, v4, s_eff, bq, bk, interpret, True)
    return out4.reshape(b, sq, hd_total), (res, skv)


def _packed_bwd(num_heads, scale, bq, bk, interpret, exp_bf16, kv_valid,
                prescaled, residuals, g):
    res, skv = residuals
    scale = LN2 if prescaled else scale
    b, sq, hd_total = g.shape
    d = hd_total // num_heads
    g4 = g.reshape(b, sq, num_heads, d)
    dq4, dk4, dv4 = _bwd(scale, bq, bk, interpret, True, res, g4)
    flat = lambda t: t.reshape(t.shape[0], t.shape[1], hd_total)
    dq, dk, dv = flat(dq4), flat(dk4), flat(dv4)
    if dk.shape[1] != skv:   # dead pad rows carried no gradient
        pad = ((0, 0), (0, skv - dk.shape[1]), (0, 0))
        dk, dv = jnp.pad(dk, pad), jnp.pad(dv, pad)
    return dq, dk, dv


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
DEFAULT_BWD_BQ = 384    # backward holds a full [Sq, D] fp32 dq block plus
DEFAULT_BWD_BK = 384    # ~4 [bq, bk] fp32 temps in VMEM — 512 blocks blew
#                         the 16MB scoped-vmem limit by 0.8MB at S=14400


def _flash_bwd_kernel(qs_ref, g_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref,
                      *, scale: float):
    """One (j, i) tile of the recompute backward.

    qs = q * scale*log2(e)  [bq, d];  g = [dO/l | -D/l]  [bq, d+1];
    k [bk, d];  v = [v | 1] [bk, d+1] (the same ones-column as the forward:
    the MXU computes dP - D in one dot).  Fixed-reference softmax means no
    saved row max: p = exp2(qs k^T) recomputes exactly what the forward used.

    dq accumulates in a full-sequence fp32 output block resident in VMEM for
    the whole (j, i) sweep of one batch-head; dk/dv accumulate per-j blocks
    across the inner i loop.
    """
    j = pl.program_id(1)
    i = pl.program_id(2)

    qs = qs_ref[0]
    g = g_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d = k.shape[-1]

    u = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(u, 120.0))           # [bq, bk] fp32
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * dp                                   # = dS (fp32)
    p_b = p.astype(k.dtype)
    ds_b = ds.astype(k.dtype)

    dv_blk = jax.lax.dot_general(p_b, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[:, :d]
    # dk = scale * dS^T q = ln2 * dS^T qs   (qs carries scale*log2e)
    dk_blk = jax.lax.dot_general(ds_b, qs, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * LN2
    dq_blk = jax.lax.dot_general(ds_b, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale

    bq = qs.shape[0]

    @pl.when(j == 0)
    def _init_dq():
        dq_ref[0, pl.ds(i * bq, bq), :] = dq_blk

    @pl.when(j > 0)
    def _acc_dq():
        dq_ref[0, pl.ds(i * bq, bq), :] += dq_blk

    @pl.when(i == 0)
    def _init_dkv():
        dk_ref[0] = dk_blk
        dv_ref[0] = dv_blk

    @pl.when(i > 0)
    def _acc_dkv():
        dk_ref[0] += dk_blk
        dv_ref[0] += dv_blk


def _flash_bwd(q3, k3, v3, o3, l3, do3, scale: float, bq: int, bk: int,
               interpret: bool):
    """[BH, S, D] backward; returns (dq3, dk3, dv3) fp32."""
    bh, sq, d = q3.shape
    skv = k3.shape[1]
    c = scale * LOG2E
    qs = (q3.astype(jnp.float32) * c).astype(q3.dtype)
    l = jnp.maximum(l3, 1e-30)[..., None]          # [bh, sq, 1] fp32
    do32 = do3.astype(jnp.float32)
    g = do32 / l
    e = jnp.sum(do32 * o3.astype(jnp.float32), axis=-1, keepdims=True) / l
    g_ext = jnp.concatenate([g, -e], axis=-1).astype(q3.dtype)
    v_ext = jnp.concatenate(
        [v3, jnp.ones((bh, skv, 1), v3.dtype)], axis=-1)

    rup = lambda x, m: -(-x // m) * m
    bq_eff = min(bq, rup(sq, 16))
    bk_eff = min(bk, rup(skv, 16))
    bq_eff = _pick_block(sq, bq_eff)
    bk_eff = _pick_block(skv, bk_eff)
    sq_pad, skv_pad = rup(sq, bq_eff), rup(skv, bk_eff)
    if sq_pad != sq:       # zero pad rows contribute exactly zero gradients
        qs = jnp.pad(qs, ((0, 0), (0, sq_pad - sq), (0, 0)))
        g_ext = jnp.pad(g_ext, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        k3 = jnp.pad(k3, ((0, 0), (0, skv_pad - skv), (0, 0)))
        v_ext = jnp.pad(v_ext, ((0, 0), (0, skv_pad - skv), (0, 0)))

    grid = (bh, skv_pad // bk_eff, sq_pad // bq_eff)
    de = d + 1
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq_eff, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq_eff, de), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk_eff, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk_eff, de), lambda b, j, i: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, sq_pad, d), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((1, bk_eff, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk_eff, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, skv_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, skv_pad, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_pad * skv_pad * d,
            bytes_accessed=(qs.size + g_ext.size + k3.size + v_ext.size) * 2,
            transcendentals=bh * sq_pad * skv_pad),
        interpret=interpret,
    )(qs, g_ext, k3, v_ext)
    return dq[:, :sq], dk[:, :skv], dv[:, :skv]


def _xla_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: float) -> jax.Array:
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum('bhqk,bkhd->bqhd', probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None, bq: int = DEFAULT_BQ,
                    bk: int = DEFAULT_BK, interpret: bool = False,
                    fixed_ref: bool = True) -> jax.Array:
    """q [B,Sq,H,D], k/v [B,Sk,H,D] -> [B,Sq,H,D]."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    bq_eff, bk_eff = _eff_blocks(sq, skv, d, bq, bk)
    # fold heads into the grid batch dim
    to3 = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, t.shape[1], d)
    out3 = _flash_fwd(to3(q), to3(k), to3(v), scale, bq_eff, bk_eff,
                      interpret, fixed_ref)
    return out3.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _eff_blocks(sq: int, skv: int, d: int, bq: int, bk: int):
    """Sublane/lane-aligned near-divisor block sizes for [*, sq|skv, d]."""
    if d > 64:
        # the swept defaults assume d=64 blocks; cap them so the VMEM
        # footprint (double-buffered q/k/v blocks, [d+1,bq] accumulator,
        # [bk,bq] logits) stays ~8MB — the SVD-VAE mid attention runs
        # single-head d=512 at seq 14400 through here (bq=bk=480, the best
        # of the on-chip sweep: 51.8 ms / 73.8 TF/s at [9,14400,512]).
        # Scaling blocks down PROPORTIONALLY to d was measured ~8x slower:
        # [320,512]@[512,96] starves the MXU
        bq = max(128, min(bq, 245760 // d // 16 * 16))
        bk = max(256, min(bk, 245760 // d // 128 * 128))
    rup = lambda x, m: -(-x // m) * m
    bq_eff = min(bq, rup(sq, 16))        # sublane-aligned block sizes
    bk_eff = min(bk, rup(skv, 128))
    # prefer an exact divisor near the target: no pad copies of q/k/v, no
    # in-kernel mask pass (e.g. S=14400 -> 960 instead of 1024+pad-to-15360)
    return _pick_block(sq, bq_eff), _pick_block(skv, bk_eff)


def _to3(t):
    b, s, h, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from3(t3, b, h):
    bh, s, d = t3.shape
    return t3.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _fwd(q, k, v, scale, bq, bk, interpret, fixed_ref=True):
    if not fixed_ref:
        out = flash_attention(q, k, v, scale, bq, bk, interpret, fixed_ref)
        return out, (q, k, v, None, None)
    b, sq, h, d = q.shape
    skv = k.shape[1]
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    # training forward (saves l): cap bq so the [bk, bq] fp32 logits temp
    # + its bf16 copy fit scoped VMEM — (2880, 960) stacked 17.14M > 16.16M
    # limit at [160,14400,64] (32-frame train step), and the r2 sweep put
    # (1440, 960) within ~3.5% of it per call
    bq_eff, bk_eff = _eff_blocks(sq, skv, d, min(bq, 1440), bk)
    out3, l3 = _flash_fwd(_to3(q), _to3(k), _to3(v), s, bq_eff, bk_eff,
                          interpret, fixed_ref, with_l=True)
    return _from3(out3, b, h), (q, k, v, _from3(out3, b, h), l3)


def _bwd(scale, bq, bk, interpret, fixed_ref, res, g):
    q, k, v, out, l3 = res
    d = q.shape[-1]
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    if l3 is None:
        # non-fixed_ref path: XLA recompute fallback (materializes S^2)
        _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, s),
                         q, k, v)
        return vjp(g)
    b, h = q.shape[0], q.shape[2]
    dq3, dk3, dv3 = _flash_bwd(_to3(q), _to3(k), _to3(v), _to3(out), l3,
                               _to3(g), s, DEFAULT_BWD_BQ, DEFAULT_BWD_BK,
                               interpret)
    return (_from3(dq3, b, h).astype(q.dtype),
            _from3(dk3, b, h).astype(k.dtype),
            _from3(dv3, b, h).astype(v.dtype))


flash_attention.defvjp(_fwd, _bwd)
