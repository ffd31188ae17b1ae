"""Mesh/sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from star_tpu.parallel import (AXIS_DATA, AXIS_TENSOR, make_mesh,
                               param_specs, shard_params, spec_for_path)


def test_mesh_axes(eight_devices):
    mesh = make_mesh(data=2, tensor=2, context=2)
    assert mesh.shape == {'data': 2, 'tensor': 2, 'context': 2}


def test_tp_rules():
    assert spec_for_path('unet/enc_0_0_spatial/block/attn1/to_q/kernel') == \
        P(None, AXIS_TENSOR)
    assert spec_for_path('unet/enc_0_0_spatial/block/attn1/to_out/kernel') == \
        P(AXIS_TENSOR, None)
    assert spec_for_path('layers/layer/qkv/base/kernel') == \
        P(None, AXIS_TENSOR)
    assert spec_for_path('layers/layer/dense/base/kernel') == \
        P(AXIS_TENSOR, None)
    assert spec_for_path('block_0/q/kernel') == P(None, AXIS_TENSOR)
    assert spec_for_path('block_0/wo/kernel') == P(AXIS_TENSOR, None)
    assert spec_for_path('unet/enc_0_0_spatial/block/ff/proj/kernel') == \
        P(None, AXIS_TENSOR)
    assert spec_for_path('unet/enc_0_0_res/in_conv/kernel') == P()
    assert spec_for_path('unet/head_norm/scale') == P()


def test_sharded_matmul_correctness(eight_devices):
    """TP-sharded dense == replicated dense (XLA inserts the collectives)."""
    mesh = make_mesh(data=4, tensor=2)
    params = {'to_q': {'kernel': jax.random.normal(jax.random.PRNGKey(0),
                                                   (16, 32))},
              'to_out': {'kernel': jax.random.normal(jax.random.PRNGKey(1),
                                                     (32, 16))}}
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 16))

    def f(p, x):
        return (x @ p['to_q']['kernel']) @ p['to_out']['kernel']

    expect = f(params, x)
    with mesh:
        sp = shard_params(params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P(AXIS_DATA)))
        got = jax.jit(f)(sp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
    # verify the kernel actually lives sharded over 'tensor'
    shard_shapes = {s.data.shape for s in sp['to_q']['kernel'].addressable_shards}
    assert shard_shapes == {(16, 16)}


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
