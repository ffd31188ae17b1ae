"""Device mesh + named-axis conventions.

Replaces the reference's process-group zoo (SAT mpu TP groups, CP groups,
Accelerate DDP, colossalai ProcessGroupMesh — SURVEY.md §2.6) with ONE
jax.sharding.Mesh carrying three named axes:

  data    — batch / denoiser chunk windows (DP; the reference's DDP + its
            prompt-list sharding)
  tensor  — attention heads & MLP inner dims (TP; replaces SAT
            Column/RowParallelLinear, transformer.py:67-94)
  context — temporal dim of the causal 3D VAE (CP; replaces the isend/irecv
            halo exchange in cp_enc_dec.py)

Collectives are inserted by XLA from sharding annotations (psum/all-gather on
ICI), never hand-written NCCL calls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = 'data'
AXIS_TENSOR = 'tensor'
AXIS_CONTEXT = 'context'


def make_mesh(data: int = 1, tensor: int = 1, context: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * tensor * context
    assert len(devices) >= n, (len(devices), n)
    dev_array = np.asarray(devices[:n]).reshape(data, tensor, context)
    return Mesh(dev_array, (AXIS_DATA, AXIS_TENSOR, AXIS_CONTEXT))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, rank: int, axis: int = 0) -> NamedSharding:
    spec = [None] * rank
    spec[axis] = AXIS_DATA
    return NamedSharding(mesh, P(*spec))
