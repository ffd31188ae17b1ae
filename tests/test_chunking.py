"""Chunked-denoiser window math + stitch parity with the reference."""

import jax.numpy as jnp
import numpy as np

import pytest

from star_tpu.pipeline.chunking import (chunked_x0_fn, make_chunks,
                                        sliding_windows_1d, stitch_slices)

pytestmark = pytest.mark.quick


def test_sliding_windows_match_reference_values():
    # 72-frame toy clip, 32-frame windows, 50% overlap
    # (video_to_video_model.py:199-210)
    assert sliding_windows_1d(72, 32, 16) == [(0, 32), (16, 48), (32, 72)]
    # short video: single absorbing window
    assert sliding_windows_1d(30, 32, 16) == [(0, 30)]
    assert sliding_windows_1d(100, 32, 16) == [(0, 32), (16, 48), (32, 64),
                                               (48, 80), (64, 100)]


def test_make_chunks_defaults():
    # chunk_len = (32-1)//1*1+1 = 32, o_len = (16-1)//1*1+1 = 16
    assert make_chunks(72, 32) == [(0, 32), (16, 48), (32, 72)]


def test_stitch_covers_every_frame_once():
    for f in (72, 100, 33, 64):
        inds = make_chunks(f, 32)
        spans = stitch_slices(inds)
        covered = []
        for (s, e), (a, b) in zip(inds, spans):
            covered.extend(range(s + a, s + b))
        assert covered == list(range(f)), (f, inds, spans)


def test_chunked_x0_equals_slicing_identity_model():
    """With an x0 model that's a pure function of (frame index, value), the
    stitched output must equal the per-window outputs on their kept spans."""
    f = 72
    inds = make_chunks(f, 32)
    xt = jnp.arange(f, dtype=jnp.float32).reshape(1, f, 1, 1, 1) \
        * jnp.ones((1, 1, 2, 2, 3))
    hint = xt * 10.0

    def denoise_chunk(x, h, t):
        return x * 2.0 + h  # frame-local -> stitch must be exact

    x0_fn = chunked_x0_fn(denoise_chunk, hint, inds)
    out = x0_fn(xt, jnp.int32(500))
    expect = np.asarray(xt) * 2.0 + np.asarray(hint)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_chunked_x0_batches_equal_length_windows():
    """Equal-length windows must be folded into one batched call."""
    f = 64
    inds = make_chunks(f, 32)
    calls = []

    def denoise_chunk(x, h, t):
        calls.append(x.shape)
        return x

    xt = jnp.ones((1, f, 2, 2, 1))
    x0_fn = chunked_x0_fn(denoise_chunk, xt, inds)
    x0_fn(xt, jnp.int32(1))
    # windows (0,32),(16,48),(32,64) all len-32 -> ONE call with batch 3
    assert calls == [(3, 32, 2, 2, 1)], calls


def test_pad_to_fit_yields_valid_latent_grid():
    """The UNet's asymmetric down/up chain needs latent H ≡ 2 (mod 8) and W a
    multiple of 8; pad_to_fit must guarantee that for any input size."""
    from star_tpu.ops.resize import pad_to_fit
    for h, w in ((240, 426), (720, 1280), (960, 1704), (1080, 1920),
                 (480, 640), (2160, 3840)):
        w1, w2, h1, h2 = pad_to_fit(h, w)
        ph, pw = h + h1 + h2, w + w1 + w2
        assert ph % 8 == 0 and pw % 8 == 0, (h, w, ph, pw)
        lat_h, lat_w = ph // 8, pw // 8
        assert lat_h % 8 == 2, (h, ph, lat_h)
        assert lat_w % 8 == 0, (w, pw, lat_w)
