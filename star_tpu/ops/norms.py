"""Normalization primitives (channels-last, fp32 statistics).

The reference uses nn.GroupNorm(32, C) everywhere in the UNet (eps 1e-5 in
ResBlocks, 1e-6 in the spatial/temporal transformers' input norms) and
nn.LayerNorm inside transformer blocks. TPU note: statistics accumulate in
float32 even under bf16 compute — GN/LN are the classic bf16 PSNR killers
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the last (channel) axis; leading axes are batch/spatial.

    x: [..., C]; scale/bias: [C].

    Statistics accumulate in fp32 (jnp reductions with fp32 dtype), but the
    bulk data never materializes as an fp32 copy — at the UNet's activation
    sizes the fp32 round-trip would double HBM traffic on an already
    memory-bound step.
    """
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    orig_shape = x.shape
    dtype = x.dtype
    # the grouped reshape exists ONLY for the (tiny-output) statistics
    # reductions; the bulk apply below runs on x in its original [..., C]
    # layout. Reshaping the bulk to [..., G, C//G] (C//G = 10 lanes of 128)
    # made XLA materialize fp32 layout-change copies of the whole activation
    # in the temporal stream — ~60 ms/step in the r2b trace.
    # (An optimization_barrier on the stats input — to stop XLA output-fusing
    # the fp32 square into the producing conv — was A/B'd in r3: decode
    # +112 ms, encode +36 ms AFTER the bf16-apply rework. The conv-fused
    # stats are the fast path; a dedicated Pallas stats kernel was also
    # measured worse — its mandatory standard input layout degraded every
    # decoder conv to T(4,128)/T(2,128) tilings.)
    xg = x.reshape(orig_shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jax.lax.square(xg.astype(jnp.float32)), axis=(1, 3),
                     keepdims=True)
    var = mean2 - jax.lax.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    # fold (x - mean) * inv * scale + bias into x * a + b with per-(batch,
    # channel) fp32 coefficients broadcast in the original layout
    scale32 = scale.astype(jnp.float32).reshape(num_groups, c // num_groups)
    a = inv * scale32          # [B,1,G,C//G]
    bcast = (orig_shape[0],) + (1,) * (x.ndim - 2) + (c,)
    mean_b = jnp.broadcast_to(
        mean, (orig_shape[0], 1, num_groups, c // num_groups)).reshape(bcast)
    a = jnp.broadcast_to(
        a, (orig_shape[0], 1, num_groups, c // num_groups)).reshape(bcast)
    # apply in the COMPUTE dtype: coefficients are fp32-derived (the fp32-
    # statistics island), but the bulk math stays bf16 — the fp32 upcast
    # materialized 5.3GB broadcast temps in the 720p VAE decoder (OOM at
    # decode_batch=2) and doubles HBM traffic everywhere. Subtract-first
    # form: (x - mean) is exact-ish for x near mean (Sterbenz), avoiding
    # the folded x*a+b form's large-magnitude rounding; e2e drift is
    # bounded by test_bf16_gate.
    y = (x - mean_b.astype(dtype)) * a.astype(dtype) + bias.astype(dtype)
    return y.astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics.

    Stats via fp32-accumulating reductions on x (one fused multi-output
    pass), bulk apply in the input dtype — the previous whole-tensor fp32
    upcast + two-pass jnp.var cost ~2x the HBM traffic per LN site on the
    UNet transformer streams (r4 trace: ~60 ms of LN stat/apply fusions).
    Same E[x^2]-mean^2 + subtract-first-apply policy as group_norm above;
    bf16 drift is gated by test_bf16_gate.
    """
    dtype = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                  keepdims=True)
    var = jnp.maximum(m2 - jax.lax.square(mean), 0.0)
    a = (jax.lax.rsqrt(var + eps)).astype(dtype)
    y = (x - mean.astype(dtype)) * a * scale.astype(dtype) \
        + bias.astype(dtype)
    return y.astype(dtype)


def gated_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     g: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm(g * x) for a precomputed per-token gate g ([..., 1],
    fp32) — e.g. the SpatialLIEM 7x7-conv sigmoid (unet_v2v.py:380-394).
    Same algebraic fold as liem_layer_norm below: the gated tensor is never
    materialized."""
    dtype = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                  keepdims=True)
    g = g.astype(jnp.float32)
    var = jnp.maximum(m2 - jax.lax.square(mean), 0.0)
    inv = jax.lax.rsqrt(var * jax.lax.square(g) + eps)
    a = (g * inv).astype(dtype)
    y = (x - mean.astype(dtype)) * a * scale.astype(dtype) \
        + bias.astype(dtype)
    return y.astype(dtype)


def liem_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    gate_w: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm(g * x) with the TemporalLIEM channel gate
    g = sigmoid(w0*max_c(x) + w1*mean_c(x)) folded algebraically into the
    LN coefficients (unet_v2v.py:396-411 followed by the block's LN,
    unet_v2v.py:479-491).

    g is a per-token scalar, so mean(g*x) = g*mean(x) and
    var(g*x) = g^2*var(x): the gated tensor is never materialized, and the
    three channel reductions (max/mean/meansq) fuse into ONE XLA pass over
    x. The Pallas spelling of this same fold (tools/negative_results/stream_fuse.py) measured
    SLOWER than the XLA chain at every UNet scale (C=320 masked-lane /
    small-array walls — see its docstring); this jnp spelling keeps the
    algebraic saving and lets XLA do the fusion.

    x: [..., C]; scale/bias: [C]; gate_w: [2] (w0 -> channel max,
    w1 -> channel mean, the TemporalLIEM Dense kernel).
    """
    dtype = x.dtype
    mx = jnp.max(x, axis=-1, keepdims=True).astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                  keepdims=True)
    gw = gate_w.astype(jnp.float32)
    g = jax.nn.sigmoid(mx * gw[0] + mean * gw[1])
    var = jnp.maximum(m2 - jax.lax.square(mean), 0.0)
    inv = jax.lax.rsqrt(var * jax.lax.square(g) + eps)
    a = (g * inv).astype(dtype)
    y = (x - mean.astype(dtype)) * a * scale.astype(dtype) \
        + bias.astype(dtype)
    return y.astype(dtype)
