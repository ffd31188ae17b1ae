"""Fused per-pixel frame attention for TPU (Pallas).

The video UNet's temporal attention attends over F≈8 frames independently at
every pixel and head (reference: unet_v2v.py:1045-1056, which materializes a
[B*HW, F, C] transpose). The XLA einsum formulation keeps HW in place but
layout assignment still materializes 5.5 GB/s shuffle copies of q/k/v (the
fusions want a (d, f, n, h, b) minor-to-major layout no Dense/reshape output
can have) plus fp32 [b,n,h,f,g] probability round-trips — together the
largest copy family in the r2b full-step trace.

This kernel consumes q/k/v in their NATURAL [B, F, N, H*D] layout (exactly
what the channel-wise projections produce), keeps the token dim N on the
vector lanes throughout, and runs the whole logits→softmax→pv chain in VMEM:

  per (b, n-block), per 128-lane head pair (two d=64 heads share a tile):
    logits[f, g, n] = Σ_d q[f,n,d]·k[g,n,d]   (VPU multiply + lane reduce;
                                               fp32, scale folded into q)
    p = exp2(min(logits, 120))                 (fixed-reference softmax —
                                               same trick as ops.flash_attention)
    out[f, n, d]   = Σ_g (p/Σp)[f,g,n]·v[g,n,d]

F-frame attention has no streaming dimension, so no online-softmax carry is
needed; everything for one n-block lives in VMEM at once. The only transpose
anywhere is the tiny [F,G,nb]→[F,nb,G] probability flip (F·G·nb elements,
~1/40th of the activation).

Backward: XLA recompute via the einsum reference (same as the previous
formulation's autodiff; the [B,H,F,G,N] logits at training shapes are small
relative to activations since F is the chunk length).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _pick_nblock(n: int, target: int = 128) -> int | None:
    # VMEM: 4 double-buffered [F, nb, H*D] blocks + fp32 chunk temps must fit
    # the 16MB Mosaic scoped limit; nb=128 keeps the UNet's largest config
    # (F=8, H*D=512) near 11 MB. Lane dim is H*D (full), nb sits on sublanes
    # so it only needs divisibility by 8.
    """Largest multiple of 8 dividing n, within [target/2, target]."""
    for cand in range(target - target % 8, target // 2 - 1, -8):
        if cand > 0 and n % cand == 0:
            return cand
    return None


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, h: int,
                     d: int):
    f = q_ref.shape[1]
    nb = q_ref.shape[2]
    hd = q_ref.shape[3]
    c = scale * LOG2E
    q2 = q_ref[0]                                     # [F, nb, HD] bf16
    k2 = k_ref[0]
    v2 = v_ref[0]

    # The per-head d-lane reduction runs on the MXU as a block-diagonal-ones
    # matmul: [F*nb, HD] @ [HD, H] sums each head's 64 lanes in the fp32
    # accumulators, replacing the r2 kernel's 6-step lane-rotate reduces
    # (the VPU bottleneck: ~6 passes per (g, head) over the product tile)
    # and collapsing the F*G*H padded one-lane exp tiles into G [F*nb, H]
    # tiles.
    lane = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    ones_bd = (lane // d == head).astype(q2.dtype)

    ps = []
    denom = jnp.zeros((f * nb, h), jnp.float32)
    for g in range(f):
        prod = q2 * k2[g][None]                       # [F, nb, HD] bf16
        l = jax.lax.dot_general(prod.reshape(f * nb, hd), ones_bd,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * c
        p = jnp.exp2(jnp.minimum(l, 120.0))           # [F*nb, H] fp32
        denom = denom + p
        ps.append(p)

    # accumulate with UNNORMALIZED exp2 weights (bf16 spans the same
    # exponent range as fp32, so 2^<=120 weights are representable) and
    # divide once at the end — one full-width multiply instead of G·H
    # padded one-lane normalizations
    bcast = lambda t: jnp.concatenate(
        [jnp.broadcast_to(t[:, hh:hh + 1].reshape(f, nb, 1), (f, nb, d))
         for hh in range(h)], axis=-1)                # [F, nb, HD]
    acc = jnp.zeros((f, nb, hd), jnp.float32)
    for g in range(f):
        pg = bcast(ps[g]).astype(v2.dtype)
        acc = acc + (pg * v2[g][None]).astype(jnp.float32)
    inv = bcast(1.0 / jnp.maximum(denom, 1e-30))      # [F, nb, HD] fp32
    o_ref[0] = (acc * inv).astype(o_ref.dtype)


def _xla_reference(q4, k4, v4, scale, h, d):
    """[B, F, N, H*D] einsum reference (the previous formulation)."""
    b, f, n, _ = q4.shape
    q5 = q4.reshape(b, f, n, h, d)
    k5 = k4.reshape(b, f, n, h, d)
    v5 = v4.reshape(b, f, n, h, d)
    logits = jnp.einsum('bfnhd,bgnhd->bhfgn', q5, k5,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=3)
    out = jnp.einsum('bhfgn,bgnhd->bfnhd', probs.astype(q4.dtype), v5,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, f, n, h * d).astype(q4.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def temporal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                       num_heads: int, scale: float | None = None,
                       nb: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """q/k/v: [B, F, N, H*D] -> out [B, F, N, H*D]; softmax over the frame
    axis independently per (token n, head)."""
    b, f, n, hd = q.shape
    assert hd % num_heads == 0, (hd, num_heads)
    d = hd // num_heads
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    from .attention import _on_tpu
    # block budget: 4 double-buffered [F, nb, H*D] bf16 blocks + fp32 chunk
    # temps must fit the 32MB scoped-vmem limit set below. The per-unit
    # byte cost GROWS with F (Mosaic-measured: F=8/HD=512/nb=120 -> 26MB
    # = 53 B per F*HD*nb unit; F=16/HD=512/nb=72 -> 47.2MB = 80 B/unit,
    # which OOM'd the f=16 train step r5) — model it linearly.
    unit = 26.0 + 3.4 * f
    target = max(32, min(128, int(28e6 // (unit * f * hd)) // 8 * 8))
    nb_eff = nb or _pick_nblock(n, target)
    if (nb_eff is None or n % nb_eff or d != 64 or f > 16
            or not (_on_tpu() or interpret)):
        return _xla_reference(q, k, v, s, num_heads, d)
    grid = (b, n // nb_eff)
    spec = pl.BlockSpec((1, f, nb_eff, hd), lambda bi, i: (bi, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_temporal_kernel, scale=s, h=num_heads, d=d),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * f * f * n * hd,
            bytes_accessed=(q.size + k.size + v.size + q.size) * 2,
            transcendentals=b * f * f * n * num_heads),
        interpret=interpret,
    )(q, k, v)


def _fwd(q, k, v, num_heads, scale, nb, interpret):
    out = temporal_attention(q, k, v, num_heads, scale, nb, interpret)
    return out, (q, k, v)


def _bwd(num_heads, scale, nb, interpret, res, g):
    q, k, v = res
    d = q.shape[-1] // num_heads
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, s, num_heads, d),
        q, k, v)
    return vjp(g)


temporal_attention.defvjp(_fwd, _bwd)
