"""Ulysses-style sequence-parallel attention (all-to-all head/sequence swap).

Behavioral reference: the vendored Open-Sora acceleration package —
_AllToAll scatter-heads/gather-sequence (utils_data/opensora/acceleration/
communications.py:8-63) consumed by SeqParallelAttention
(models/layers/blocks.py:345-423). There it rides torch.distributed
all_to_all; here it is jax.lax.all_to_all inside shard_map over a mesh axis —
XLA lowers it to ICI collectives.

Layout: tokens sharded over the sequence dim. Inside the shard_map body each
device holds q/k/v [B, S/P, H, D]; the first all_to_all regroups to
[B, S, H/P, D] (full sequence, head subset), plain attention runs locally,
and the inverse all_to_all restores [B, S/P, H, D].

Non-divisible sequences: callers may pass inputs whose true length is not a
multiple of the axis size — pad to the multiple and give the pad tail no
attention weight via `kv_valid` (round-2 review item: the assert-only
contract made odd frame counts unusable at context>2).
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.attention import dot_product_attention


def _masked_attention(q, k, v, scale, kv_valid: int):
    """fp32-softmax attention with the key tail >= kv_valid masked out."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    bias = jnp.where(jnp.arange(k.shape[1]) < kv_valid, 0.0, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32) + bias, axis=-1)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _local_ulysses(q, k, v, axis_name: str, scale, kv_valid: int | None):
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            split_axis=2, concat_axis=1, tiled=True)
    qg, kg, vg = a2a(q), a2a(k), a2a(v)          # [B, S, H/P, D]
    if kv_valid is not None and kv_valid < kg.shape[1]:
        out = _masked_attention(qg, kg, vg, scale, kv_valid)
    else:
        out = dot_product_attention(qg, kg, vg, scale=scale)
    return jax.lax.all_to_all(out, axis_name=axis_name, split_axis=1,
                              concat_axis=2, tiled=True)  # [B, S/P, H, D]


def ulysses_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                      axis_name: str = 'context',
                      scale: float | None = None,
                      kv_valid: int | None = None) -> jax.Array:
    """q/k/v: [B, S, H, D] (global view; S sharded over `axis_name`).

    Requires H % mesh.shape[axis_name] == 0. S may be any length: a
    non-multiple is zero-padded to the axis multiple here and the pad tail
    is masked out of the softmax; the output is sliced back to S.
    `kv_valid` < S additionally masks caller-side dead tail rows (e.g. a
    residual stream carried at a padded length)."""
    n = mesh.shape[axis_name]
    assert q.shape[2] % n == 0, (q.shape, n)
    s = q.shape[1]
    valid = s if kv_valid is None else min(kv_valid, s)
    s_pad = -(-s // n) * n
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    eff_valid = valid if valid < s_pad else None
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_local_ulysses, axis_name=axis_name, scale=scale,
                          kv_valid=eff_valid),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    out = fn(q, k, v)
    return out[:, :s]
