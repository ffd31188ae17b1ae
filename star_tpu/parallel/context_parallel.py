"""Context-parallel primitives for the causal 3D VAE: time-dim sharding with
a ppermute halo exchange and a psum-gathered GroupNorm.

Behavioral reference: cp_enc_dec.py — _fake_cp_pass_from_previous_rank
(:241-288, isend/irecv of the last k-1 frames to the next rank; rank 0
replicate-pads the first frame) and ContextParallelGroupNorm (:433-441,
gather -> norm -> scatter). Here the halo rides jax.lax.ppermute and the
gathered statistics ride psum — XLA ICI collectives instead of NCCL p2p.

These run inside shard_map over the mesh 'context' axis; each device holds
[B, T/P, H, W, C].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map
    import inspect as _inspect
    if 'check_rep' in _inspect.signature(_shard_map).parameters:
        shard_map = _shard_map
    else:
        def shard_map(*a, check_rep=None, **kw):  # jax>=0.9: check_vma
            if check_rep is not None:
                kw.setdefault('check_vma', check_rep)
            return _shard_map(*a, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .mesh import AXIS_CONTEXT


def _halo_from_previous(x_local: jax.Array, kt: int, axis_name: str
                        ) -> jax.Array:
    """Prepend the previous rank's last kt-1 frames (rank 0: replicate its
    first frame — the causal-start rule, cp_enc_dec.py:278-282)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = x_local[:, -(kt - 1):]
    prev_tail = jax.lax.ppermute(tail, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    first_pad = jnp.repeat(x_local[:, :1], kt - 1, axis=1)
    front = jnp.where(idx == 0, first_pad, prev_tail)
    return jnp.concatenate([front, x_local], axis=1)


def _local_causal_conv(x_local, kernel, bias, *, kt, kh, kw, axis_name):
    xp = _halo_from_previous(x_local, kt, axis_name) if kt > 1 else x_local
    out = jax.lax.conv_general_dilated(
        xp, kernel, (1, 1, 1),
        [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return out + bias


def cp_causal_conv3d(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                     mesh: Mesh, axis_name: str = AXIS_CONTEXT) -> jax.Array:
    """Causal 3D conv over time-sharded video [B, T, H, W, C] (global view).

    Equivalent to the single-device causal conv with replicate-first-frame
    padding; the chunk boundary state flows over ICI instead of through the
    reference's CPU cache."""
    kt, kh, kw = kernel.shape[:3]
    spec = P(None, axis_name, None, None, None)
    fn = shard_map(
        functools.partial(_local_causal_conv, kt=kt, kh=kh, kw=kw,
                          axis_name=axis_name),
        mesh=mesh, in_specs=(spec, P(), P()), out_specs=spec)
    return fn(x, kernel, bias)


def _local_group_norm(x_local, scale, bias, *, num_groups, eps, axis_name):
    c = x_local.shape[-1]
    b = x_local.shape[0]
    xg = x_local.reshape(b, -1, num_groups, c // num_groups)
    # gathered statistics: psum over the context axis
    cnt = jnp.float32(xg.shape[1]) * jax.lax.psum(1.0, axis_name)
    s1 = jax.lax.psum(jnp.sum(xg, axis=(1, 3), dtype=jnp.float32,
                              keepdims=True), axis_name)
    s2 = jax.lax.psum(jnp.sum(jax.lax.square(xg.astype(jnp.float32)),
                              axis=(1, 3), keepdims=True), axis_name)
    denom = cnt * (c // num_groups)
    mean = s1 / denom
    var = s2 / denom - jax.lax.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    scale32 = scale.astype(jnp.float32).reshape(num_groups, c // num_groups)
    bias32 = bias.astype(jnp.float32).reshape(num_groups, c // num_groups)
    a = inv * scale32
    bb = bias32 - mean * a
    y = xg.astype(jnp.float32) * a + bb
    return y.reshape(x_local.shape).astype(x_local.dtype)


def cp_group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                  mesh: Mesh, num_groups: int = 32, eps: float = 1e-6,
                  axis_name: str = AXIS_CONTEXT) -> jax.Array:
    """Gathered GroupNorm over time-sharded video (global statistics —
    ContextParallelGroupNorm semantics)."""
    spec = P(None, axis_name, None, None, None)
    fn = shard_map(
        functools.partial(_local_group_norm, num_groups=num_groups, eps=eps,
                          axis_name=axis_name),
        mesh=mesh, in_specs=(spec, P(), P()), out_specs=spec)
    return fn(x, scale, bias)


# ---------------------------------------------------------------------------
# Dead-slot CP layout for the full causal VAE (encoder/decoder end to end).
#
# The reference splits a (1 + P*k)-frame clip as [1+k | k | ... | k]
# (cp_enc_dec.py:76-94: rank 0 keeps the causal first frame), which cannot be
# a uniform shard_map layout. TPU-first equivalent: every rank holds k+1
# SLOTS — rank 0's are all real ([f0..fk]); rank i>0 holds its k real frames
# followed by one trailing DEAD slot. Dead slots flow through spatial ops as
# garbage and are (a) excluded from gathered GN statistics, (b) skipped by the
# halo exchange, (c) regenerated by the temporal resamplers, whose
# pair-pooling then never straddles a rank boundary (the very property the
# reference's 1+k split exists for). k must stay >= kt-1 == 2 at the deepest
# temporal level.
# ---------------------------------------------------------------------------


def cp_pad_to_slots(x: jax.Array, n_ranks: int) -> jax.Array:
    """[B, 1+P*k, ...] -> [B, P*(k+1), ...] dead-slot layout (host/XLA-side,
    before shard_map)."""
    t = x.shape[1]
    assert (t - 1) % n_ranks == 0, (t, n_ranks)
    k = (t - 1) // n_ranks
    chunks = [x[:, :k + 1]]
    for i in range(1, n_ranks):
        c = x[:, 1 + i * k: 1 + (i + 1) * k]
        pad = jnp.zeros_like(c[:, :1])
        chunks.append(jnp.concatenate([c, pad], axis=1))
    return jnp.concatenate(chunks, axis=1)


def cp_unpad_from_slots(x: jax.Array, n_ranks: int) -> jax.Array:
    """Inverse of cp_pad_to_slots after a gathered output."""
    slots = x.shape[1] // n_ranks
    k = slots - 1
    parts = [x[:, :slots]]
    for i in range(1, n_ranks):
        parts.append(x[:, i * slots: i * slots + k])
    return jnp.concatenate(parts, axis=1)


def _is_first(axis_name: str) -> jax.Array:
    return jax.lax.axis_index(axis_name) == 0


def cp_slot_halo_front(x_local: jax.Array, kt: int, axis_name: str
                       ) -> jax.Array:
    """Front padding frames for a causal time conv under the dead-slot
    layout: rank 0 replicates the true first frame; rank i receives the
    previous rank's last kt-1 REAL frames over ICI."""
    m = kt - 1
    k = x_local.shape[1] - 1
    n = jax.lax.axis_size(axis_name)
    # this rank's real tail (to send): slots [k+1-m, k+1) on rank 0,
    # [k-m, k) elsewhere
    start = jnp.where(_is_first(axis_name), k + 1 - m, k - m)
    tail = jax.lax.dynamic_slice_in_dim(x_local, start, m, axis=1)
    prev_tail = jax.lax.ppermute(tail, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    first_pad = jnp.repeat(x_local[:, :1], m, axis=1)
    return jnp.where(_is_first(axis_name), first_pad, prev_tail)


def cp_slot_real_mask(x_local: jax.Array, axis_name: str) -> jax.Array:
    """[T_slots] float32 mask of real (non-dead) slots on this rank."""
    slots = x_local.shape[1]
    all_real = jnp.ones((slots,), jnp.float32)
    last_dead = all_real.at[-1].set(0.0)
    return jnp.where(_is_first(axis_name), all_real, last_dead)


def cp_slot_group_norm(x_local: jax.Array, scale: jax.Array, bias: jax.Array,
                       num_groups: int, eps: float, axis_name: str
                       ) -> jax.Array:
    """Gathered GroupNorm over the dead-slot layout: global statistics over
    real slots only (== the reference's full-clip gather_norm)."""
    b, tl = x_local.shape[0], x_local.shape[1]
    c = x_local.shape[-1]
    mask = cp_slot_real_mask(x_local, axis_name)          # [T]
    xg = x_local.reshape(b, tl, -1, num_groups, c // num_groups)
    w = mask[None, :, None, None, None]
    s1 = jax.lax.psum(jnp.sum(xg.astype(jnp.float32) * w, axis=(1, 2, 4),
                              keepdims=True), axis_name)
    s2 = jax.lax.psum(jnp.sum(jax.lax.square(xg.astype(jnp.float32)) * w,
                              axis=(1, 2, 4), keepdims=True), axis_name)
    cnt = jax.lax.psum(mask.sum(), axis_name) * xg.shape[2] * xg.shape[4]
    mean = s1 / cnt
    var = s2 / cnt - jax.lax.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    scale32 = scale.astype(jnp.float32).reshape(num_groups, c // num_groups)
    bias32 = bias.astype(jnp.float32).reshape(num_groups, c // num_groups)
    a = inv * scale32[None, None, None]
    bb = bias32[None, None, None] - mean * a
    y = xg.astype(jnp.float32) * a + bb
    return y.reshape(x_local.shape).astype(x_local.dtype)


def _pool_pairs_time(z: jax.Array) -> jax.Array:
    b, t = z.shape[0], z.shape[1]
    return z.reshape(b, t // 2, 2, *z.shape[2:]).mean(axis=2, dtype=z.dtype)


def cp_slot_pool_time(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Global first-frame-special 2x temporal avg-pool over the dead-slot
    layout ([k+1] slots -> [k/2+1] slots; pairs never straddle ranks)."""
    k = x_local.shape[1] - 1
    assert k % 2 == 0, k
    first = jnp.concatenate([x_local[:, :1],
                             _pool_pairs_time(x_local[:, 1:])], axis=1)
    rest = jnp.concatenate([_pool_pairs_time(x_local[:, :k]),
                            jnp.zeros_like(x_local[:, :1])], axis=1)
    return jnp.where(_is_first(axis_name), first, rest)


def _repeat_time(z: jax.Array, r: int) -> jax.Array:
    return jnp.repeat(z, r, axis=1)


def cp_slot_upsample_time(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Global first-frame-special 2x temporal nearest upsample over the
    dead-slot layout ([k+1] -> [2k+1] slots)."""
    k = x_local.shape[1] - 1
    first = jnp.concatenate([x_local[:, :1],
                             _repeat_time(x_local[:, 1:], 2)], axis=1)
    rest = jnp.concatenate([_repeat_time(x_local[:, :k], 2),
                            jnp.zeros_like(x_local[:, :1])], axis=1)
    return jnp.where(_is_first(axis_name), first, rest)  # [2k+1] slots


def cp_slot_repeat_zq(zq_local: jax.Array, r: int, axis_name: str
                      ) -> jax.Array:
    """Temporal part of SpatialNorm3D's zq interpolation under the dead-slot
    layout: first frame kept single, rest repeated r times
    (cp_enc_dec.py:488-497 semantics; spatial resize is applied by the
    caller)."""
    if r == 1:
        return zq_local
    kz = zq_local.shape[1] - 1
    first = jnp.concatenate([zq_local[:, :1],
                             _repeat_time(zq_local[:, 1:], r)], axis=1)
    rest = jnp.concatenate([_repeat_time(zq_local[:, :kz], r),
                            jnp.zeros_like(zq_local[:, :1])], axis=1)
    return jnp.where(_is_first(axis_name), first, rest)  # [kz*r+1] slots
