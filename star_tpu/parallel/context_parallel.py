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
