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
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.attention import dot_product_attention


def _local_ulysses(q, k, v, axis_name: str, scale):
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            split_axis=2, concat_axis=1, tiled=True)
    qg, kg, vg = a2a(q), a2a(k), a2a(v)          # [B, S, H/P, D]
    out = dot_product_attention(qg, kg, vg, scale=scale)
    return jax.lax.all_to_all(out, axis_name=axis_name, split_axis=1,
                              concat_axis=2, tiled=True)  # [B, S/P, H, D]


def ulysses_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                      axis_name: str = 'context',
                      scale: float | None = None) -> jax.Array:
    """q/k/v: [B, S, H, D] (global view; S sharded over `axis_name`).

    Requires H % mesh.shape[axis_name] == 0 and S % it == 0.
    """
    n = mesh.shape[axis_name]
    assert q.shape[2] % n == 0, (q.shape, n)
    assert q.shape[1] % n == 0, (q.shape, n)
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_local_ulysses, axis_name=axis_name, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
