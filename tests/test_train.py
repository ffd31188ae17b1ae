"""Trainer tests: trainable-set filter, loss semantics, a real train step,
and checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from star_tpu.diffusion import DiffusionTables, default_star_schedule
from star_tpu.models.unet.unet import VideoUNetTrunk
from star_tpu.train import (TrainConfig, fourier_split, is_trainable,
                            make_train_state, make_train_step, star_sr_loss,
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
    x = jnp.zeros((b, f, h, w, 4))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 7, 32))
    params = m.init(jax.random.PRNGKey(0), x, t, y, x)
    # zero-init head/zero-convs would block all gradients at init (real runs
    # start from converted non-zero weights) — perturb them for the test
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if any(s in '/'.join(map(str, p)) for s in
                                     ('head_conv', 'zero_conv', 'middle_out',
                                      'out_conv')) else v, params)
    return m, params, (b, f, h, w)


def test_trainable_filter():
    assert is_trainable('controlnet/enc_0_0_res/in_conv/kernel')
    assert is_trainable('unet/enc_0_0_spatial/block/local1/conv/kernel')
    assert is_trainable('unet/enc_0_0_temporal/block/local2/proj/kernel')
    assert not is_trainable('unet/enc_0_0_res/in_conv/kernel')
    assert not is_trainable('unet/head_conv/kernel')


def test_frozen_params_stay_frozen(setup):
    m, params, (b, f, h, w) = setup
    cfg = TrainConfig(freq_loss=False)
    state, tx = make_train_state(cfg, params)
    tables = DiffusionTables.from_schedule(default_star_schedule())
    step = make_train_step(
        cfg, lambda p, x, t, y, hint: m.apply(p, x, t, y, hint), tables, tx)
    batch = {
        'gt_latent': jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4)),
        'lq_latent': jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 4)),
        'y': jax.random.normal(jax.random.PRNGKey(3), (b, 7, 32)),
    }
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics['total_loss']))

    mask = trainable_mask(params)
    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
    changed = frozen_changed = 0
    for path, old in flat_old:
        new = flat_new[path]
        if flat_mask[path]:
            changed += int(not np.allclose(np.asarray(old), np.asarray(new)))
        else:
            frozen_changed += int(not np.array_equal(np.asarray(old),
                                                     np.asarray(new)))
    assert frozen_changed == 0
    assert changed > 0


def test_frozen_bf16_step(setup):
    """cast_frozen holds the frozen tree in bf16 (stop_frozen_grads DCEs
    its cotangents); the step must still update trainable fp32 masters
    and leave frozen leaves bit-identical bf16."""
    from star_tpu.train import cast_frozen
    m, params, (b, f, h, w) = setup
    params = cast_frozen(params)
    mask = trainable_mask(params)
    for (path, p), mk in zip(jax.tree_util.tree_leaves_with_path(params),
                             jax.tree.leaves(mask)):
        assert p.dtype == (jnp.float32 if mk else jnp.bfloat16), path
    cfg = TrainConfig(freq_loss=False)
    state, tx = make_train_state(cfg, params)
    tables = DiffusionTables.from_schedule(default_star_schedule())
    step = make_train_step(
        cfg, lambda p, x, t, y, hint: m.apply(p, x, t, y, hint), tables, tx)
    batch = {
        'gt_latent': jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4)),
        'lq_latent': jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 4)),
        'y': jax.random.normal(jax.random.PRNGKey(3), (b, 7, 32)),
    }
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics['total_loss']))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
    changed = 0
    for path, old in jax.tree_util.tree_leaves_with_path(state.params):
        new = flat_new[path]
        if flat_mask[path]:
            changed += int(not np.allclose(np.asarray(old, np.float32),
                                           np.asarray(new, np.float32)))
        else:
            assert new.dtype == jnp.bfloat16
            assert np.array_equal(np.asarray(old, np.float32),
                                  np.asarray(new, np.float32)), path
    assert changed > 0


def test_loss_and_grads_scalars_only(setup):
    """The bench's fwd+bwd-only mode returns finite scalar metrics and a
    positive grad norm without touching optimizer state."""
    import optax
    m, params, (b, f, h, w) = setup
    cfg = TrainConfig(freq_loss=False)
    tables = DiffusionTables.from_schedule(default_star_schedule())
    step = make_train_step(
        cfg, lambda p, x, t, y, hint: m.apply(p, x, t, y, hint), tables,
        optax.identity())
    batch = {
        'gt_latent': jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4)),
        'lq_latent': jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 4)),
        'y': jax.random.normal(jax.random.PRNGKey(3), (b, 7, 32)),
    }
    metrics = jax.jit(step.loss_and_grads)(params, batch,
                                           jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics['total_loss']))
    assert float(metrics['grad_norm']) > 0


def test_loss_weighting_semantics():
    v = jnp.ones((1, 4))
    target = jnp.zeros((1, 4))
    loss, metrics = star_sr_loss(v, target, jnp.array([0]))
    assert float(loss) == pytest.approx(1.0)
    # with pixels: freq term adds, scaled by (1 - t/999)
    pix = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    gt = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 3))
    loss_t0, m0 = star_sr_loss(v, target, jnp.array([0]), pix, gt)
    loss_t999, m999 = star_sr_loss(v, target, jnp.array([999]), pix, gt)
    # at t=999, weight_t = 0 -> pure v loss
    assert float(loss_t999) == pytest.approx(float(m999['loss_v']), rel=1e-5)
    assert float(loss_t0) > float(m0['loss_v'])


def test_fourier_split_partitions_spectrum():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
    low, high = fourier_split(x)
    fft = jnp.fft.rfft2(x, axes=(-3, -2))
    recon = (low[..., 0] + 1j * low[..., 1]) + (high[..., 0] + 1j * high[..., 1])
    np.testing.assert_allclose(np.asarray(recon), np.asarray(fft), atol=1e-4)


def test_checkpoint_save_restore(tmp_path, setup):
    m, params, _ = setup
    from star_tpu.convert import load_params, save_params
    path = str(tmp_path / 'ckpt')
    save_params(path, params)
    restored = load_params(path)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(restored)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_cog_trainable_filter_and_step():
    """CogVideoX trainer: LoRA/final/proj_sr/LIEM trainable only; one step
    decreases nothing frozen."""
    from star_tpu.train.cog_trainer import (CogTrainConfig, cog_is_trainable,
                                            cog_trainable_mask,
                                            make_cog_optimizer,
                                            make_cog_train_step)
    from star_tpu.train.trainer import TrainState
    from star_tpu.models.dit.dit import CogVideoDiT

    assert cog_is_trainable('layers/layer/qkv/lora_a/kernel')
    assert cog_is_trainable('final_linear/kernel')
    assert cog_is_trainable('proj_sr/kernel')
    assert cog_is_trainable('layers/layer/spa_local/conv/kernel')
    assert not cog_is_trainable('layers/layer/qkv/base/kernel')
    assert not cog_is_trainable('text_proj/kernel')

    dit = CogVideoDiT(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
                      latent_channels=4, text_hidden_size=32, text_length=8,
                      time_embed_dim=16, lora_rank=4)
    b, t, h, w = 1, 2, 8, 8
    params = dit.init(jax.random.PRNGKey(0), jnp.zeros((b, t, h, w, 8)),
                      jnp.zeros((b,), jnp.int32), jnp.zeros((b, 8, 32)))
    cfg = CogTrainConfig(freq_loss=False)
    tx = make_cog_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step = make_cog_train_step(
        cfg, lambda p, x, i, y: dit.apply(p, x, i, y), tx)
    batch = {'gt_latent': jax.random.normal(jax.random.PRNGKey(1),
                                            (b, t, h, w, 4)),
             'lq_latent': jax.random.normal(jax.random.PRNGKey(2),
                                            (b, t, h, w, 4)),
             'y': jax.random.normal(jax.random.PRNGKey(3), (b, 8, 32))}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics['total_loss']))

    mask = cog_trainable_mask(params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(mask))
    frozen_changed = trainable_changed = 0
    for path, old in jax.tree_util.tree_leaves_with_path(params):
        new = flat_new[path]
        if flat_mask[path]:
            trainable_changed += int(not np.allclose(np.asarray(old),
                                                     np.asarray(new)))
        else:
            frozen_changed += int(not np.array_equal(np.asarray(old),
                                                     np.asarray(new)))
    assert frozen_changed == 0
    assert trainable_changed > 0


def test_load_star_models_roundtrip(tmp_path):
    """convert.load.load_star_models: orbax {unet,vae,clip} layout + bf16
    cast (the CLI weight-loading path)."""
    import jax
    import jax.numpy as jnp
    from star_tpu.convert import save_params
    from star_tpu.convert.load import load_star_models

    trees = {
        'unet': {'unet': {'conv_in': {'kernel': np.ones((3, 3, 4, 8),
                                                        np.float32)}}},
        'vae': {'encoder': {'conv_in': {'bias': np.zeros((8,), np.float32)}}},
        'clip': {'token_embedding': np.ones((10, 4), np.float32)},
    }
    for name, tree in trees.items():
        save_params(str(tmp_path / name), tree)
    models = load_star_models(str(tmp_path), dtype=jnp.bfloat16)
    k = models.unet_params['params']['unet']['conv_in']['kernel']
    assert k.dtype == jnp.bfloat16 and k.shape == (3, 3, 4, 8)
    assert models.text_params['params']['token_embedding'].dtype == jnp.bfloat16
