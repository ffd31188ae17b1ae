"""Aux subsystem tests: metrics, ZeRO-1 sharding, tar webdataset reader,
EMA, profiling timer."""

import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_psnr_identity_and_ordering():
    from star_tpu.utils.metrics import psnr
    a = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (2, 16, 16, 3)))
    assert float(psnr(a, a)) > 80
    noisy1 = a + 5.0
    noisy2 = a + 20.0
    assert float(psnr(a, noisy1)) > float(psnr(a, noisy2))
    # known value: uniform offset of 10 -> psnr = 20*log10(255/10)
    assert float(psnr(a, a + 10.0)) == pytest.approx(28.13, abs=0.05)


def test_ssim_identity_and_ordering():
    from star_tpu.utils.metrics import ssim
    a = jnp.asarray(np.random.RandomState(1).uniform(0, 255, (2, 32, 32, 3)))
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    blurry = jnp.asarray(np.asarray(a) * 0.5 + 60)
    assert float(ssim(a, blurry)) < 0.99


def test_zero1_opt_state_sharding(eight_devices):
    import optax
    from star_tpu.parallel import make_mesh
    from star_tpu.parallel.zero import shard_opt_state
    mesh = make_mesh(data=8)
    params = {'w': jnp.zeros((16, 24)), 'b': jnp.zeros((3,))}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    sharded = shard_opt_state(opt_state, mesh)
    mu_w = sharded[0].mu['w']
    # 16 % 8 == 0 -> sharded over the first dim
    shard_shapes = {s.data.shape for s in mu_w.addressable_shards}
    assert shard_shapes == {(2, 24)}
    # 3 doesn't divide 8 -> replicated
    mu_b = sharded[0].mu['b']
    assert {s.data.shape for s in mu_b.addressable_shards} == {(3,)}
    # the sharded state still drives a correct update
    with mesh:
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = jax.jit(tx.update)(grads, sharded, params)
    assert np.isfinite(np.asarray(updates['w'])).all()


def test_tar_video_dataset(tmp_path):
    from star_tpu.data.io import save_video
    from star_tpu.data.webds import TarVideoDataset
    # build a shard with two samples {key.mp4, key.txt}
    vids = tmp_path / 'v'
    os.makedirs(vids)
    rng = np.random.RandomState(0)
    for key in ('s1', 's2'):
        save_video(rng.randint(0, 255, (4, 16, 16, 3), dtype=np.uint8),
                   str(vids), key + '.mp4', fps=4)
        (vids / (key + '.txt')).write_text('caption ' + key)
    shard = tmp_path / 'shard-000.tar'
    with tarfile.open(shard, 'w') as tf:
        for key in ('s1', 's2'):
            tf.add(vids / (key + '.mp4'), arcname=key + '.mp4')
            tf.add(vids / (key + '.txt'), arcname=key + '.txt')
    samples = list(TarVideoDataset([str(shard)]))
    assert len(samples) == 2
    assert samples[0]['__key__'] == 's1'
    assert samples[0]['txt'] == 'caption s1'
    assert samples[0]['mp4'].shape == (4, 16, 16, 3)
    # rank striding
    assert len(list(TarVideoDataset([str(shard)], 1, 2))) == 0


def test_ema_update():
    from star_tpu.train import init_ema, update_ema
    p = {'w': jnp.ones((4,))}
    ema = init_ema(p)
    p2 = {'w': jnp.zeros((4,))}
    ema = update_ema(ema, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema['w']), 0.9)


def test_step_timer():
    from star_tpu.utils.profiling import StepTimer
    t = StepTimer()
    f = jax.jit(lambda x: x * 2)
    t.timed('double', f, jnp.ones((4,)), warmup=1, iters=3)
    s = t.summary()
    assert 'double' in s and s['double'] > 0


def test_general_conditioner():
    from star_tpu.models.conditioner import GeneralConditioner, TextEmbedder

    class Tok:
        def __call__(self, texts):
            return np.array([[len(t) % 7, 1] for t in texts], np.int32)

    emb = TextEmbedder('txt', Tok(),
                       lambda tok: jnp.asarray(tok, jnp.float32)[:, :, None]
                       * jnp.ones((1, 1, 4)), ucg_rate=0.0)
    cond = GeneralConditioner([emb])
    batch = {'txt': ['hello world', 'another prompt']}
    c, uc = cond.get_unconditional_conditioning(batch)
    assert c['crossattn'].shape == (2, 2, 4)
    assert not np.allclose(np.asarray(c['crossattn']),
                           np.asarray(uc['crossattn']))
    # negative-prompt uncond
    c2, uc2 = cond.get_unconditional_conditioning(
        batch, negative_batch={'txt': ['bad quality', 'bad quality']})
    assert not np.allclose(np.asarray(uc2['crossattn']),
                           np.asarray(uc['crossattn']))
    # ucg dropout blanks with rate 1
    emb_d = TextEmbedder('txt', Tok(),
                         lambda tok: jnp.asarray(tok, jnp.float32),
                         ucg_rate=1.0)
    out = GeneralConditioner([emb_d])(batch)
    np.testing.assert_allclose(np.asarray(out['vector']),
                               np.asarray(GeneralConditioner([emb_d])(
                                   batch, force_uncond=True)['vector']))


def _make_shards(tmp_path, n_shards=3, per_shard=4):
    import tarfile as _tar
    shards = []
    for s in range(n_shards):
        shard = tmp_path / f'shard-{s:03d}.tar'
        with _tar.open(shard, 'w') as tf:
            for i in range(per_shard):
                key = f's{s}_{i}'
                p = tmp_path / (key + '.txt')
                p.write_text(f'caption {key}')
                tf.add(p, arcname=key + '.txt')
        shards.append(str(shard))
    return shards


def test_webds_shard_and_sample_shuffle(tmp_path):
    from star_tpu.data.webds import TarVideoDataset
    shards = _make_shards(tmp_path)
    plain = [s['__key__'] for s in TarVideoDataset(shards)]
    ds = TarVideoDataset(shards, shuffle_seed=1, shuffle_buffer=6)
    ep0 = [s['__key__'] for s in ds]
    assert sorted(ep0) == sorted(plain) and ep0 != plain
    # next epoch reshuffles differently but covers the same set
    ep1 = [s['__key__'] for s in ds]
    assert sorted(ep1) == sorted(plain) and ep1 != ep0


def test_webds_resumable_iteration(tmp_path):
    from star_tpu.data.webds import TarVideoDataset
    shards = _make_shards(tmp_path)
    ds = TarVideoDataset(shards, shuffle_seed=3)
    it = iter(ds)
    head = [next(it)['__key__'] for _ in range(5)]
    state = ds.state_dict()
    rest_a = [s['__key__'] for s in it]           # drain the epoch

    ds2 = TarVideoDataset(shards, shuffle_seed=3)
    ds2.load_state_dict(state)
    rest_b = [s['__key__'] for s in iter(ds2)]
    assert rest_b[:len(rest_a)] == rest_a
    assert set(head).isdisjoint(rest_b[:len(rest_a)])
