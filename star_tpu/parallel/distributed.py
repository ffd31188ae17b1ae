"""Multi-host (DCN) distributed initialization + hybrid mesh layout.

Replaces the reference's NCCL/tcp:// bootstrap (arguments.py:179-253 and
Accelerate's DDP env init) with jax.distributed: one call per host process,
then a hybrid mesh whose 'data' axis spans hosts over DCN while 'tensor' and
'context' stay inside a host's ICI domain — collectives for TP/CP ride ICI,
only the DP gradient reduction crosses DCN (the scaling-book recipe).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import AXIS_CONTEXT, AXIS_DATA, AXIS_TENSOR


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process.

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, also honoring MEGASCALE_* and
    TPU_WORKER_* where jax handles them automatically). Single-process runs
    (no coordinator anywhere) are a no-op. Returns (process_index,
    process_count)."""
    coordinator = coordinator or os.environ.get('JAX_COORDINATOR_ADDRESS')
    # Decide from env/args ALONE: jax.process_count() would initialize the
    # local backend, and jax.distributed.initialize must run before any
    # backend init — querying first would break the multi-host path.
    if coordinator and not getattr(init_distributed, '_done', False):
        kw = {}
        if num_processes is not None:
            kw['num_processes'] = num_processes
        if process_id is not None:
            kw['process_id'] = process_id
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
        init_distributed._done = True
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(data: int = -1, tensor: int = 1,
                     context: int = 1) -> Mesh:
    """Mesh with 'data' spanning hosts (DCN-friendly) and tensor/context
    packed within each host's devices (ICI).

    data=-1 uses every remaining device. Requires tensor*context to divide
    the per-process device count so TP/CP groups never cross hosts."""
    per_host = len(jax.local_devices())
    n_total = len(jax.devices())
    inner = tensor * context
    assert per_host % inner == 0, (
        f'tensor*context={inner} must divide local device count {per_host} '
        f'so TP/CP collectives stay on ICI')
    if data == -1:
        data = n_total // inner
    assert data * inner <= n_total, (data, inner, n_total)

    # order devices host-major so the leading (data) axis strides across
    # hosts last — contiguous inner blocks stay within one host
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs[:data * inner]).reshape(data, tensor, context)
    return Mesh(arr, (AXIS_DATA, AXIS_TENSOR, AXIS_CONTEXT))
