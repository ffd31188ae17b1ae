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


def _head_chunks(h: int, d: int):
    """Split the H*D lane dim into 128-wide head pairs (+ a 64 tail when H is
    odd). Each chunk is (lane offset, lane width, heads in chunk)."""
    chunks = []
    off = 0
    heads_left = h
    while heads_left >= 2:
        chunks.append((off, 2 * d, 2))
        off += 2 * d
        heads_left -= 2
    if heads_left:
        chunks.append((off, d, 1))
    return chunks


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, h: int,
                     d: int):
    f = q_ref.shape[1]
    nb = q_ref.shape[2]
    c = scale * LOG2E
    outs = []
    for off, w, nheads in _head_chunks(h, d):
        qp = q_ref[0][:, :, off:off + w]                  # [F, nb, w] bf16
        kp = k_ref[0][:, :, off:off + w]
        vp = v_ref[0][:, :, off:off + w]

        # keepdims lane-reduces keep nb on the SUBLANES end to end: logits
        # are born [F, nb, 1], exactly the shape the pv lane-broadcast wants.
        # (Reducing the lane dim away instead moves nb onto the lanes, and
        # the stack/transpose needed to get back lowered to an unsupported
        # gather in Mosaic.) The qk product is bf16 with fp32 accumulation
        # (MXU semantics, same as the flash kernel's dots); the scale/log2e
        # factor is applied exactly on the tiny reduced logits. exp weights
        # are fixed-reference exp2 (no row max — see ops/flash_attention.py).
        # Measured variants at (F=8, HD=512, N=14400): this stored-weights
        # form 7.5 ms; two-pass recompute 7.5 ms; lane-packing the logits to
        # [F, nb, G] before the exp 10.5 ms (the pack/unpack lane shifts cost
        # more than the padded one-lane exp tiles they save).
        probs = []
        denoms = [jnp.zeros((f, nb, 1), jnp.float32) for _ in range(nheads)]
        for g in range(f):
            prod = qp * kp[g][None]                       # [F, nb, w]
            row = []
            for hh in range(nheads):
                l = jnp.sum(prod[:, :, hh * d:(hh + 1) * d]
                            .astype(jnp.float32), axis=-1, keepdims=True) * c
                p = jnp.exp2(jnp.minimum(l, 120.0))       # [F, nb, 1]
                denoms[hh] = denoms[hh] + p
                row.append(p)
            probs.append(row)

        # accumulate with UNNORMALIZED exp2 weights (bf16 spans the same
        # exponent range as fp32, so 2^<=120 weights are representable) and
        # divide once at the end — one full-width multiply instead of G·H
        # padded one-lane normalizations
        acc = jnp.zeros((f, nb, w), jnp.float32)
        for g in range(f):
            pg = jnp.concatenate(
                [jnp.broadcast_to(probs[g][hh].astype(qp.dtype), (f, nb, d))
                 for hh in range(nheads)], axis=-1)       # [F, nb, w]
            acc = acc + (pg * vp[g][None]).astype(jnp.float32)
        inv = jnp.concatenate(
            [jnp.broadcast_to(1.0 / jnp.maximum(dn, 1e-30), (f, nb, d))
             for dn in denoms], axis=-1)                  # [F, nb, w] fp32
        outs.append(acc * inv)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


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
    # block budget: 4 double-buffered [F, nb, H*D] bf16 blocks + the G·H
    # lane-padded probability tiles must fit the 32MB scoped-vmem limit set
    # below (~45 bytes per F*HD*nb unit, measured: the largest UNet config
    # F=8, HD=512, nb=120 compiles at ~26MB)
    target = max(32, min(128, int(28e6 // (45 * f * hd)) // 8 * 8))
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
