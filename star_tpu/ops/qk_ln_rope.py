"""Fused qk-LayerNorm + 3D-RoPE prologue for the DiT attention (Pallas).

The XLA formulation of this chain (per-head LN stats -> apply -> half-split
rotate -> cos/sin multiply) materialized six fp32 [2,9680,3072] relayout
copies plus five unfused fp32 passes per CogVideoX layer — ~490 ms/step at
42 layers (r3 trace). This kernel does the whole chain in one pass over the
projection output in its natural [B, S, H*D] layout:

  * per-head mean/meansq via an MXU block-diagonal-ones matmul
    ([bs, L] @ [L, L/d] — same trick as ops/temporal_attention.py), then
    broadcast BACK to lanes with the transposed ones matmul;
  * normalize + per-head scale/bias (tables pre-tiled across heads, with
    the flash kernel's softmax scale*log2e folded into q's scale/bias —
    rotation commutes with scalar scale);
  * half-split rotate as static 32-lane slices per head + one concat;
  * multiply with full-sequence cos/sin tables whose text/pad rows are the
    identity rotation.

fp32 statistics and rotation math in-kernel; bf16 in/out. Off-TPU the jnp
reference below is used (tests compare the kernel in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _pick_bs(s: int, target: int = 512) -> int:
    """Largest multiple of 16 dividing s, preferring [target/2, target] but
    accepting any divisor >= 128 (9680's divisors are 176/880/1936...);
    else the minimal-pad block."""
    for cand in range(target - target % 16, 127, -16):
        if cand > 0 and s % cand == 0:
            return cand
    return min(target, -(-s // 16) * 16)


def _kernel(x_ref, cos_ref, sin_ref, sc_ref, bi_ref, o_ref, *, d: int,
            eps: float):
    x = x_ref[0].astype(jnp.float32)                    # [bs, L]
    bs, L = x.shape
    nh = L // d
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, nh), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (L, nh), 1)
    ones_bd = (lane // d == head).astype(jnp.float32)   # [L, nh]

    msum = jax.lax.dot_general(x, ones_bd, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    m2sum = jax.lax.dot_general(x * x, ones_bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mean = msum / d                                     # [bs, nh]
    var = m2sum / d - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # broadcast per-head stats back onto their 64 lanes via the transposed
    # ones matmul (a lane-splat the MXU does for free)
    bd_t = ones_bd.T                                    # [nh, L]
    mean_l = jax.lax.dot_general(mean, bd_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_l = jax.lax.dot_general(inv, bd_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    y = (x - mean_l) * inv_l * sc_ref[0][None, :] + bi_ref[0][None, :]
    half = d // 2
    parts = []
    for h in range(nh):
        o = h * d
        parts.append(-y[:, o + half:o + d])
        parts.append(y[:, o:o + half])
    rot = jnp.concatenate(parts, axis=-1)               # [bs, L]
    out = y * cos_ref[...] + rot * sin_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def qk_ln_rope_reference(x: jax.Array, scale: jax.Array, bias: jax.Array,
                         cos_full: jax.Array, sin_full: jax.Array,
                         num_heads: int, eps: float = 1e-6,
                         fold_scale: float = 1.0) -> jax.Array:
    """jnp reference / CPU fallback (same math, XLA lowering)."""
    b, s, c = x.shape
    d = c // num_heads
    x32 = x.astype(jnp.float32).reshape(b, s, num_heads, d)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)) \
        * fold_scale
    half = d // 2
    rot = jnp.concatenate([-y[..., half:], y[..., :half]], axis=-1)
    out = (y.reshape(b, s, c) * cos_full[None]
           + rot.reshape(b, s, c) * sin_full[None])
    return out.astype(x.dtype)


def qk_ln_rope(x: jax.Array, scale: jax.Array, bias: jax.Array,
               cos_full: jax.Array, sin_full: jax.Array, num_heads: int,
               eps: float = 1e-6, fold_scale: float = 1.0,
               lane_chunk: int = 1536, interpret: bool = False) -> jax.Array:
    """x [B, S, H*D] -> LN'd + roped [B, S, H*D] (bf16-preserving).

    cos/sin_full: [S, H*D] fp32 head-tiled tables (identity rows where no
    rotation applies). fold_scale multiplies the LN affine output (used to
    fold the attention softmax scale into q)."""
    b, s, c = x.shape
    d = c // num_heads
    if d % 2 or c % 128:
        return qk_ln_rope_reference(x, scale, bias, cos_full, sin_full,
                                    num_heads, eps, fold_scale)
    from .attention import _on_tpu
    if not (_on_tpu() or interpret):
        return qk_ln_rope_reference(x, scale, bias, cos_full, sin_full,
                                    num_heads, eps, fold_scale)

    L = min(lane_chunk, c)
    while c % L or L % d or L % 128:
        L //= 2
        if L < max(d, 128):
            return qk_ln_rope_reference(x, scale, bias, cos_full, sin_full,
                                        num_heads, eps, fold_scale)
    bs = _pick_bs(s)
    s_pad = -(-s // bs) * bs
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        pad_tab = ((0, s_pad - s), (0, 0))
        cos_full = jnp.pad(cos_full, pad_tab, constant_values=1.0)
        sin_full = jnp.pad(sin_full, pad_tab)

    sc = jnp.tile(scale.astype(jnp.float32), num_heads) * fold_scale
    bi = jnp.tile(bias.astype(jnp.float32), num_heads) * fold_scale
    sc = sc.reshape(1, c)
    bi = bi.reshape(1, c)

    grid = (b, s_pad // bs, c // L)
    out = pl.pallas_call(
        functools.partial(_kernel, d=d, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, L), lambda bb, i, l: (bb, i, l)),
            pl.BlockSpec((bs, L), lambda bb, i, l: (i, l)),
            pl.BlockSpec((bs, L), lambda bb, i, l: (i, l)),
            pl.BlockSpec((1, L), lambda bb, i, l: (0, l)),
            pl.BlockSpec((1, L), lambda bb, i, l: (0, l)),
        ],
        out_specs=pl.BlockSpec((1, bs, L), lambda bb, i, l: (bb, i, l)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel')),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * s_pad * c,
            bytes_accessed=b * s_pad * c * 4 + s_pad * c * 8,
            transcendentals=b * s_pad * (c // d)),
        interpret=interpret,
    )(x, cos_full.astype(jnp.float32), sin_full.astype(jnp.float32), sc, bi)
    return out[:, :s]
