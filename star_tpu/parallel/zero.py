"""ZeRO-1-style optimizer-state sharding.

Replaces the reference's DeepSpeed zero-stage configuration
(arguments.py:110-118,231-236) and the colossalai LowLevelZero plugin
(utils_data/opensora/acceleration/plugin.py): AdamW moments are sharded over
the mesh 'data' axis instead of replicated. Under jit, XLA keeps the update
math local to each shard and gathers parameters where consumed — the ZeRO-1
communication pattern emerges from the sharding annotation, no hand-written
reduce-scatter.

Frozen leaves (optax.multi_transform MaskedNode / set_to_zero states) carry
no arrays and pass through untouched.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA


def _shardable_axis(shape, n: int) -> int | None:
    for ax, dim in enumerate(shape):
        if dim % n == 0 and dim >= n:
            return ax
    return None


def shard_opt_state(opt_state: Any, mesh: Mesh,
                    axis: str = AXIS_DATA) -> Any:
    """device_put every optimizer-state array sharded over `axis` along its
    first divisible dim (replicated when no dim divides)."""
    n = mesh.shape[axis]

    def _put(leaf):
        if not hasattr(leaf, 'shape') or leaf.ndim == 0:
            return leaf
        ax = _shardable_axis(leaf.shape, n)
        if ax is None:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = [None] * leaf.ndim
        spec[ax] = axis
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(_put, opt_state)


def opt_state_memory_bytes(opt_state: Any) -> int:
    return sum(getattr(l, 'nbytes', 0) for l in jax.tree.leaves(opt_state))
