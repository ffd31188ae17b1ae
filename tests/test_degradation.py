"""Degradation engine tests (kernels, jpeg, noise, end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.data.degradation import (add_gaussian_noise, add_poisson_noise,
                                       bivariate_gaussian,
                                       circular_lowpass_kernel, degrade_video,
                                       filter2d, jpeg_compress,
                                       sample_degradation_params, usm_sharpen)


def test_kernels_normalized():
    k = bivariate_gaussian(21, 1.5, 1.5, 0.3, True)
    assert k.shape == (21, 21) and k.sum() == pytest.approx(1.0)
    ka = bivariate_gaussian(21, 2.5, 0.5, 0.7, False)
    assert ka.sum() == pytest.approx(1.0)
    assert not np.allclose(ka, ka.T)  # anisotropic
    ks = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert ks.shape == (21, 21) and ks.sum() == pytest.approx(1.0)


def test_filter2d_identity_with_pulse():
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (2, 16, 16, 3))
                    .astype(np.float32))
    pulse = np.zeros((21, 21), np.float32)
    pulse[10, 10] = 1.0
    out = filter2d(x, jnp.asarray(pulse))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_gaussian_blur_smooths():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    k = jnp.asarray(bivariate_gaussian(21, 3.0, 3.0, 0.0).astype(np.float32))
    out = filter2d(x, k)
    assert float(jnp.std(out)) < float(jnp.std(x))


def test_jpeg_quality_monotone():
    # smooth natural-ish content (gradients + a low-freq pattern): the
    # rounding error must grow as quality drops
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = np.stack([yy, xx, np.sin(4 * yy) * np.cos(3 * xx) * 0.5 + 0.5], -1)
    x = jnp.asarray(img[None].astype(np.float32))
    errs = [float(jnp.abs(jpeg_compress(x, q) - x).mean())
            for q in (95.0, 60.0, 30.0)]
    assert errs[0] < errs[1] < errs[2], errs


def test_noise_ops():
    x = jnp.full((2, 16, 16, 3), 0.5, jnp.float32)
    g = add_gaussian_noise(x, jax.random.PRNGKey(0), 20.0, gray=False)
    assert float(jnp.std(g)) > 0.01
    gg = add_gaussian_noise(x, jax.random.PRNGKey(0), 20.0, gray=True)
    # gray noise: identical across channels
    np.testing.assert_allclose(np.asarray(gg[..., 0]), np.asarray(gg[..., 1]))
    p = add_poisson_noise(x, jax.random.PRNGKey(1), 1.0, gray=False)
    assert float(jnp.std(p)) > 0.001


def test_usm_sharpen_increases_local_contrast():
    rng = np.random.RandomState(3)
    base = rng.uniform(0.2, 0.8, (1, 32, 32, 3)).astype(np.float32)
    x = jnp.asarray(base)
    out = usm_sharpen(x)
    assert out.shape == x.shape
    assert float(jnp.std(out)) >= float(jnp.std(x)) * 0.99


def test_params_sampling_deterministic():
    a = sample_degradation_params(42)
    b = sample_degradation_params(42)
    np.testing.assert_allclose(a.stage1.kernel, b.stage1.kernel)
    assert a.stage1.jpeg_quality == b.stage1.jpeg_quality
    c = sample_degradation_params(43)
    assert not np.allclose(a.stage1.kernel, c.stage1.kernel) or \
        a.stage1.jpeg_quality != c.stage1.jpeg_quality


def test_degrade_video_end_to_end():
    gt = np.random.RandomState(4).uniform(0, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    lq, gt_usm = degrade_video(gt, scale=4, seed=7, use_codec=False)
    assert lq.shape == (2, 16, 16, 3)
    assert gt_usm.shape == gt.shape
    assert 0.0 <= lq.min() and lq.max() <= 1.0
    # degraded-then-upsampled differs from a clean downsample
    assert np.abs(lq - np.asarray(jax.image.resize(
        jnp.asarray(gt), (2, 16, 16, 3), 'linear'))).mean() > 0.005


def test_codec_proxy_blocks_and_smears():
    """Device-side codec proxy: lossy, blockwise, temporally dependent, and
    substitutes for PyAV in codec_roundtrip (reference degrade_video.py:48-76
    H.264 stage)."""
    import jax.numpy as jnp
    from star_tpu.data.degradation import codec_proxy, codec_roundtrip

    rng = np.random.RandomState(0)
    # smooth moving-gradient content + mild texture (random noise would be
    # legitimately destroyed at q=20, as a real codec would)
    yy, xx = np.mgrid[0:32, 0:48].astype(np.float32)
    base = np.stack([np.sin(xx / 8 + t) * 0.25 + yy / 64 + 0.3
                     for t in range(4)])[..., None]
    frames = np.clip(np.repeat(base, 3, axis=-1) +
                     rng.uniform(-0.05, 0.05, (4, 32, 48, 3)), 0, 1) \
        .astype(np.float32)
    out = np.asarray(codec_proxy(jnp.asarray(frames), seed=3, quality=20.0))
    assert out.shape == frames.shape
    assert np.isfinite(out).all()
    err = np.abs(out - frames).mean()
    assert 0.005 < err < 0.2, err          # lossy but not destroyed
    # higher quality -> closer to source
    hi = np.asarray(codec_proxy(jnp.asarray(frames), seed=3, quality=90.0))
    assert np.abs(hi - frames).mean() < err
    # temporal dependence: changing frame 0 changes the P-frame recon chain
    frames2 = frames.copy()
    frames2[0] += 0.25
    out2 = np.asarray(codec_proxy(jnp.asarray(np.clip(frames2, 0, 1)),
                                  seed=3, quality=20.0))
    assert np.abs(out2[1:] - out[1:]).max() > 1e-4
    # codec_roundtrip falls back to the proxy without PyAV (not a no-op)
    rt = codec_roundtrip(frames, seed=3)
    assert rt.shape == frames.shape and np.abs(rt - frames).mean() > 0.003


def test_mid_recipe_targets_final_size_in_stage1():
    """degrade_video_mid.py variant: stage 1 resizes toward the final LR
    size; outputs keep the contract and differ from the default recipe."""
    import numpy as np
    from star_tpu.data.degradation import degrade_video

    gt = np.random.RandomState(0).uniform(0, 1, (2, 64, 64, 3)) \
        .astype(np.float32)
    lq_mid, _ = degrade_video(gt, scale=4, seed=3, use_codec=False,
                              recipe='mid')
    lq_def, _ = degrade_video(gt, scale=4, seed=3, use_codec=False)
    assert lq_mid.shape == lq_def.shape == (2, 16, 16, 3)
    assert np.isfinite(lq_mid).all()
    assert not np.allclose(lq_mid, lq_def)


def test_paired_random_crop_alignment():
    """LQ/GT crops land at the same scaled location
    (RealESRGAN_Deg_pipeline.py:342-407)."""
    import numpy as np
    from star_tpu.data.degradation import paired_random_crop

    scale, gt_patch = 4, 32
    gt = np.random.RandomState(0).uniform(0, 1, (64, 96, 3)).astype(np.float32)
    # lq that is literally the strided gt: alignment is then checkable
    lq = gt[::scale, ::scale]
    rng = np.random.RandomState(1)
    gt_c, lq_c = paired_random_crop(rng, gt, lq, gt_patch, scale)
    assert gt_c.shape == (gt_patch, gt_patch, 3)
    assert lq_c.shape == (gt_patch // scale, gt_patch // scale, 3)
    np.testing.assert_allclose(gt_c[::scale, ::scale], lq_c)
    # scale mismatch is rejected
    try:
        paired_random_crop(rng, gt, lq[:-1], gt_patch, scale)
    except ValueError:
        pass
    else:
        raise AssertionError('expected ValueError on scale mismatch')


def test_augment_paired_consistent_draw():
    import numpy as np
    from star_tpu.data.degradation import augment_paired

    a = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    b = a * 2
    # same RNG draw applies identically to every input
    a2, b2 = augment_paired(np.random.RandomState(7), a, b)
    np.testing.assert_allclose(a2 * 2, b2)
    # some seed flips horizontally
    flipped = False
    for seed in range(8):
        a3, = augment_paired(np.random.RandomState(seed), a, rotation=False)
        if not np.array_equal(a3, a):
            flipped = True
            np.testing.assert_allclose(a3, a[:, :, ::-1])
    assert flipped


def test_realesrgan_image_pair_contract():
    """Image recipe (RealESRGAN_Deg_pipeline.forward): augment -> 2-stage
    degradation (no codec) -> paired crop; shapes + determinism."""
    import numpy as np
    from star_tpu.data.degradation import realesrgan_image_pair

    img = np.random.RandomState(0).uniform(0, 1, (96, 128, 3)) \
        .astype(np.float32)
    gt_c, gt_usm_c, lq_c = realesrgan_image_pair(img, scale=4, gt_size=64,
                                                 seed=5)
    assert gt_c.shape == gt_usm_c.shape == (64, 64, 3)
    assert lq_c.shape == (16, 16, 3)
    assert np.isfinite(lq_c).all() and 0 <= lq_c.min() and lq_c.max() <= 1
    # USM sharpening actually changed the crop
    assert not np.allclose(gt_c, gt_usm_c)
    # same seed reproduces
    gt2, _, lq2 = realesrgan_image_pair(img, scale=4, gt_size=64, seed=5)
    np.testing.assert_allclose(gt_c, gt2)
    np.testing.assert_allclose(lq_c, lq2)
