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


def test_hybrid_mesh_layout(eight_devices):
    """'data' axis strides across process blocks; tensor*context contiguous
    within one host's devices (single-process here, but the ordering
    invariant is what keeps TP/CP on ICI in multi-host runs)."""
    from star_tpu.parallel import init_distributed, make_hybrid_mesh

    idx, cnt = init_distributed()      # no coordinator -> no-op
    assert idx == 0 and cnt == 1
    mesh = make_hybrid_mesh(data=2, tensor=2, context=2)
    assert mesh.shape == {'data': 2, 'tensor': 2, 'context': 2}
    arr = mesh.devices
    # inner (tensor, context) block of data-row 0 = first 4 device ids
    inner_ids = sorted(d.id for d in arr[0].flatten())
    assert inner_ids == sorted(d.id for d in jax.devices()[:4])
    # data=-1 fills all devices
    mesh_all = make_hybrid_mesh(tensor=2)
    assert mesh_all.shape['data'] == 4


def test_chunk_windows_shard_over_data(eight_devices):
    """chunked_x0_fn shards the folded window batch over 'data' and the
    stitched output matches the unsharded path."""
    import jax.numpy as jnp
    from star_tpu.pipeline.chunking import chunked_x0_fn, make_chunks

    f = 14
    chunk_inds = make_chunks(f, 4)         # six equal 4-frame windows
    assert len(chunk_inds) == 6
    x = jax.random.normal(jax.random.PRNGKey(0), (1, f, 4, 4, 2))
    hint = jax.random.normal(jax.random.PRNGKey(1), (1, f, 4, 4, 2))

    def denoise(xc, hc, t):
        return xc * 0.5 + hc * 0.1 + t

    ref_fn = chunked_x0_fn(denoise, hint, chunk_inds)
    ref = ref_fn(x, jnp.float32(0.3))

    mesh = make_mesh(data=2)
    sh_fn = chunked_x0_fn(denoise, hint, chunk_inds, mesh=mesh)
    with mesh:
        got = jax.jit(sh_fn)(x, jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
