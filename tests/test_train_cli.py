"""Train-path scale-out tests on the 8-virtual-device CPU mesh.

Covers the round-1 gaps flagged in VERDICT.md: (a) the CLI can now form a
global batch of data_parallel*batch_size samples and shard dim 0 (reference
runs torchrun x8 DDP, train_sr.sh:1-14); (b) TP is exercised on the REAL
UNet forward, not a toy matmul; (c) the full train step runs at
data=2 x tensor=2 and matches the replicated step numerically; (d) EMA
(reference opensora train_utils.py:7) is wired into the train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from star_tpu.diffusion import DiffusionTables, default_star_schedule
from star_tpu.models.unet.unet import VideoUNetTrunk
from star_tpu.parallel import AXIS_DATA, make_mesh, shard_params
from star_tpu.train import (TrainConfig, make_train_state, make_train_step,
                            trainable_mask)


class TinyControlled(nn.Module):
    def setup(self):
        kw = dict(dim=32, dim_mult=(1, 2), head_dim=16,
                  num_heads_init_temporal=2, context_dim=32,
                  attn_scales=(1.0, 0.5))
        self.unet = VideoUNetTrunk(name='unet', **kw)
        self.controlnet = VideoUNetTrunk(name='controlnet', is_controlnet=True,
                                         **kw)

    def __call__(self, x, t, y, hint):
        return self.unet(x, t, y,
                         controls=self.controlnet(x, t, y, hint=hint))


@pytest.fixture(scope='module')
def setup():
    m = TinyControlled()
    b, f, h, w = 2, 2, 10, 8
    x = jax.random.normal(jax.random.PRNGKey(10), (b, f, h, w, 4))
    t = jnp.array([3, 7], jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(11), (b, 7, 32))
    hint = jax.random.normal(jax.random.PRNGKey(12), (b, f, h, w, 4))
    params = m.init(jax.random.PRNGKey(0), x, t, y, x)
    # perturb zero-init heads so gradients flow (see test_train.py)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if any(s in '/'.join(map(str, p)) for s in
                                     ('head_conv', 'zero_conv', 'middle_out',
                                      'out_conv')) else v, params)
    return m, params, (x, t, y, hint)


def test_tp_sharded_unet_forward_matches_replicated(eight_devices, setup):
    """The actual ControlNet+UNet forward under data=2 x tensor=2 sharding
    equals the single-device result — XLA's inserted collectives implement
    what SAT's Column/RowParallelLinear does by hand."""
    m, params, (x, t, y, hint) = setup
    expect = m.apply(params, x, t, y, hint)

    mesh = make_mesh(data=2, tensor=2)
    with mesh:
        sp = shard_params(params, mesh)
        bsh = NamedSharding(mesh, P(AXIS_DATA))
        got = jax.jit(m.apply)(sp, jax.device_put(x, bsh), t,
                               jax.device_put(y, bsh),
                               jax.device_put(hint, bsh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)
    # prove the qkv kernels actually live sharded over 'tensor'
    flat = jax.tree_util.tree_leaves_with_path(sp)
    qkv = [(p, v) for p, v in flat
           if 'to_q' in '/'.join(map(str, p)) and p[-1].key == 'kernel']
    assert qkv, 'no to_q kernels found'
    for _, v in qkv:
        shapes = {s.data.shape for s in v.addressable_shards}
        full = v.shape
        assert shapes == {(full[0], full[1] // 2)}, (full, shapes)


def test_train_step_dp2_tp2_matches_replicated(eight_devices, setup):
    """One real train step (grads, AdamW, EMA) at data=2 x tensor=2 ==
    the replicated step, and EMA follows decay*ema + (1-decay)*params."""
    m, params, (x, t, y, hint) = setup
    cfg = TrainConfig(freq_loss=False, ema_decay=0.999)
    tables = DiffusionTables.from_schedule(default_star_schedule())
    batch = {
        'gt_latent': jax.random.normal(jax.random.PRNGKey(1), x.shape),
        'lq_latent': jax.random.normal(jax.random.PRNGKey(2), x.shape),
        'y': jax.random.normal(jax.random.PRNGKey(3), (2, 7, 32)),
    }
    key = jax.random.PRNGKey(4)

    def run(params_in, batch_in, mesh=None):
        state, tx = make_train_state(cfg, params_in)
        step = make_train_step(
            cfg, lambda p, xx, tt, yy, hh: m.apply(p, xx, tt, yy, hh),
            tables, tx)
        if mesh is None:
            return jax.jit(step)(state, batch_in, key)
        with mesh:
            return jax.jit(step)(state, batch_in, key)

    ref_state, ref_metrics = run(params, batch)

    mesh = make_mesh(data=2, tensor=2)
    bsh = NamedSharding(mesh, P(AXIS_DATA))
    sp = shard_params(params, mesh)
    sbatch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    got_state, got_metrics = run(sp, sbatch, mesh)

    assert float(got_metrics['total_loss']) == pytest.approx(
        float(ref_metrics['total_loss']), rel=1e-4)

    # trainable params updated identically; EMA populated and correct
    assert got_state.ema_params is not None
    mask = dict(jax.tree_util.tree_leaves_with_path(trainable_mask(params)))
    new = dict(jax.tree_util.tree_leaves_with_path(got_state.params))
    ref_new = dict(jax.tree_util.tree_leaves_with_path(ref_state.params))
    ema = dict(jax.tree_util.tree_leaves_with_path(got_state.ema_params))
    old = dict(jax.tree_util.tree_leaves_with_path(params))
    checked = 0
    for path, is_tr in mask.items():
        if not is_tr:
            continue
        np.testing.assert_allclose(np.asarray(new[path]),
                                   np.asarray(ref_new[path]),
                                   atol=2e-5, rtol=1e-4)
        want_ema = (np.asarray(old[path]) * cfg.ema_decay +
                    np.asarray(new[path]) * (1 - cfg.ema_decay))
        np.testing.assert_allclose(np.asarray(ema[path]), want_ema,
                                   atol=1e-6, rtol=1e-5)
        checked += 1
    assert checked > 0


def test_cli_batch_collection_cycles_and_stacks():
    from star_tpu.cli.train_sr import collect_samples, stack_batch

    data = [{'gt': np.full((2, 4, 4, 3), i, np.float32),
             'lq': np.zeros((2, 4, 4, 3), np.float32),
             'text': f't{i}'} for i in range(3)]
    it = iter(data)
    samples, it = collect_samples(it, lambda: iter(data), 5)
    assert [s['text'] for s in samples] == ['t0', 't1', 't2', 't0', 't1']
    gt, lq, texts = stack_batch(samples)
    assert gt.shape == (5, 2, 4, 4, 3) and lq.shape == gt.shape
    assert texts == ['t0', 't1', 't2', 't0', 't1']
    assert gt[2, 0, 0, 0, 0] == 2.0


def test_preview_x0_shape(setup):
    """trainer preview hook (log_video counterpart) returns decodable x0."""
    m, params, (x, t, y, hint) = setup
    cfg = TrainConfig(freq_loss=False)
    tables = DiffusionTables.from_schedule(default_star_schedule())
    _, tx = make_train_state(cfg, params)
    step = make_train_step(
        cfg, lambda p, xx, tt, yy, hh: m.apply(p, xx, tt, yy, hh), tables, tx,
        vae_decode=None)
    batch = {'gt_latent': x, 'lq_latent': x,
             'y': jax.random.normal(jax.random.PRNGKey(3), (2, 7, 32))}
    x0 = step.preview_x0(params, batch, jax.random.PRNGKey(0))
    assert x0.shape == x.shape
    assert np.isfinite(np.asarray(x0)).all()


def test_cog_train_step_dp2_tp2_matches_replicated(eight_devices):
    """One real CogVideoX DiT train step (LoRA/final/proj_sr/LIEM trainable,
    AdamW, EMA) at data=2 x tensor=2 == the replicated step — the Cog-side
    counterpart of test_train_step_dp2_tp2_matches_replicated (reference
    training plumbing: diffusion_video.py:94-164, loss.py:196-278)."""
    from star_tpu.models.dit.dit import CogVideoDiT
    from star_tpu.train.cog_trainer import (CogTrainConfig,
                                            cog_trainable_mask,
                                            make_cog_train_state,
                                            make_cog_train_step)

    dit = CogVideoDiT(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
                      latent_channels=4, text_hidden_size=32, text_length=8,
                      time_embed_dim=16, lora_rank=4)
    b, t, h, w = 2, 2, 8, 8
    params = dit.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 8)),
                      jnp.zeros((b,), jnp.int32), jnp.zeros((b, 8, 32)))
    cfg = CogTrainConfig(freq_loss=False, ema_decay=0.999)
    batch = {
        'gt_latent': jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, 4)),
        'lq_latent': jax.random.normal(jax.random.PRNGKey(2), (b, t, h, w, 4)),
        'y': jax.random.normal(jax.random.PRNGKey(3), (b, 8, 32)),
    }
    key = jax.random.PRNGKey(4)

    def run(params_in, batch_in, mesh=None):
        state, tx = make_cog_train_state(cfg, params_in)
        step = make_cog_train_step(
            cfg, lambda p, x, i, y: dit.apply(p, x, i, y), tx)
        if mesh is None:
            return jax.jit(step)(state, batch_in, key)
        with mesh:
            return jax.jit(step)(state, batch_in, key)

    ref_state, ref_metrics = run(params, batch)

    mesh = make_mesh(data=2, tensor=2)
    bsh = NamedSharding(mesh, P(AXIS_DATA))
    sp = shard_params(params, mesh)
    sbatch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    got_state, got_metrics = run(sp, sbatch, mesh)

    assert float(got_metrics['total_loss']) == pytest.approx(
        float(ref_metrics['total_loss']), rel=1e-4)
    assert got_state.ema_params is not None

    # LoRA qkv kernels really live sharded over 'tensor'
    flat = jax.tree_util.tree_leaves_with_path(sp)
    lora = [(p, v) for p, v in flat
            if 'qkv/lora_a' in '/'.join(str(getattr(k, 'key', k)) for k in p)
            and p[-1].key == 'kernel']
    assert lora, 'no lora_a kernels found'
    for _, v in lora:
        shapes = {s.data.shape for s in v.addressable_shards}
        full = v.shape
        assert shapes == {(full[0], full[1], full[2] // 2)}, (full, shapes)

    mask = dict(jax.tree_util.tree_leaves_with_path(cog_trainable_mask(params)))
    new = dict(jax.tree_util.tree_leaves_with_path(got_state.params))
    ref_new = dict(jax.tree_util.tree_leaves_with_path(ref_state.params))
    old = dict(jax.tree_util.tree_leaves_with_path(params))
    ema = dict(jax.tree_util.tree_leaves_with_path(got_state.ema_params))
    checked = 0
    for path, is_tr in mask.items():
        if not is_tr:
            continue
        np.testing.assert_allclose(np.asarray(new[path]),
                                   np.asarray(ref_new[path]),
                                   atol=2e-5, rtol=1e-4)
        want_ema = (np.asarray(old[path]) * cfg.ema_decay +
                    np.asarray(new[path]) * (1 - cfg.ema_decay))
        np.testing.assert_allclose(np.asarray(ema[path]), want_ema,
                                   atol=1e-6, rtol=1e-5)
        checked += 1
    assert checked > 0
