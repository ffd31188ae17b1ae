"""End-to-end CogVideoX SR pipeline on tiny models (CPU analog of the
reference's sample_sr.py gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.models.dit.dit import CogVideoDiT
from star_tpu.models.t5.tokenizer import T5HashTokenizer
from star_tpu.pipeline.cogvideo_sr import (CogModelBundle, CogSamplerConfig,
                                           CogVideoSRPipeline)
from star_tpu.vae.causal_vae import (CausalDecoder3D, CausalEncoder3D,
                                     CogVideoVAE)


class TinyVAE(CogVideoVAE):
    def setup(self):
        self.encoder = CausalEncoder3D(ch=32, ch_mult=(1, 1, 1, 1),
                                       num_res_blocks=1, z_channels=4,
                                       name='encoder')
        self.decoder = CausalDecoder3D(ch=32, ch_mult=(1, 1, 1, 1),
                                       num_res_blocks=1, z_channels=4,
                                       name='decoder')


CTX_DIM = 32
TEXT_LEN = 8


@pytest.fixture(scope='module')
def pipeline():
    vae = TinyVAE()
    dit = CogVideoDiT(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
                      latent_channels=4, text_hidden_size=CTX_DIM,
                      text_length=TEXT_LEN, time_embed_dim=16)

    f, h, w = 9, 32, 48
    t_lat = 3
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, f, h, w, 3)))
    dparams = dit.init(jax.random.PRNGKey(1),
                       jnp.zeros((2, t_lat, h // 8, w // 8, 8)),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, TEXT_LEN, CTX_DIM)))

    class Text:
        def __call__(self, tokens):
            # stand-in text encoder: embed token ids deterministically
            t = jnp.asarray(tokens, jnp.float32)
            return jnp.stack([t * (i + 1) / 1000.0
                              for i in range(CTX_DIM)], axis=-1)

    class Tok(T5HashTokenizer):
        def __call__(self, texts, max_length=TEXT_LEN):
            return super().__call__(texts, max_length)

    def vae_decode_window(vp, latents, cache, first):
        variables = {'params': vp['params']}
        if cache:
            variables['cache'] = cache
        out, mut = vae.apply(variables, latents, True, first,
                             method=TinyVAE.decode, mutable=['cache'])
        return out, mut['cache']

    bundle = CogModelBundle(
        dit_apply=lambda p, x, t, c: dit.apply(p, x, t, c),
        vae_encode=lambda p, v, key: vae.apply(p, v, key,
                                               method=TinyVAE.encode),
        vae_decode_window=vae_decode_window,
        text_encode=lambda p, tok: Text()(tok),
        tokenizer=Tok(),
        params={'dit': dparams, 'vae': vparams, 'text': {}})
    return CogVideoSRPipeline(bundle, CogSamplerConfig(num_steps=6))


def test_enhance_end_to_end(pipeline):
    frames = (np.random.RandomState(0).uniform(0, 255, (9, 32, 48, 3))
              .astype(np.uint8))
    out = pipeline.enhance_a_video(frames, 'a boat', seed=3)
    assert out.shape == (9, 32, 48, 3)
    assert out.dtype == np.uint8
    assert out.std() > 0


def test_deterministic(pipeline):
    frames = (np.random.RandomState(1).uniform(0, 255, (9, 32, 48, 3))
              .astype(np.uint8))
    a = pipeline.enhance_a_video(frames, 'x', seed=7)
    b = pipeline.enhance_a_video(frames, 'x', seed=7)
    np.testing.assert_array_equal(a, b)


def test_rejects_bad_frame_count(pipeline):
    frames = np.zeros((8, 32, 48, 3), np.uint8)
    with pytest.raises(AssertionError):
        pipeline.enhance_a_video(frames, 'x')


def test_longer_clip_uses_chunked_decode(pipeline):
    frames = (np.random.RandomState(2).uniform(0, 255, (17, 32, 48, 3))
              .astype(np.uint8))  # 17 frames -> 5 latent frames (odd)
    out = pipeline.enhance_a_video(frames, 'long', seed=1)
    assert out.shape == (17, 32, 48, 3)


def test_rejects_even_latent_count(pipeline):
    frames = np.zeros((21, 32, 48, 3), np.uint8)  # -> 6 latents (even)
    with pytest.raises(AssertionError):
        pipeline.enhance_a_video(frames, 'x')


def test_t2v_sample_end_to_end():
    """Stock (liem=False) T2V path: prompt -> frames (reference demo:
    cogvideox-based/inference/cli_demo.py)."""
    from star_tpu.pipeline.cogvideo_t2v import (CogT2VBundle,
                                                CogVideoT2VPipeline)

    vae = TinyVAE()
    dit = CogVideoDiT(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
                      latent_channels=4, text_hidden_size=CTX_DIM,
                      text_length=TEXT_LEN, time_embed_dim=16, liem=False)
    h, w = 32, 48
    t_lat = 3
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, h, w, 3)))
    dparams = dit.init(jax.random.PRNGKey(1),
                       jnp.zeros((2, t_lat, h // 8, w // 8, 4)),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, TEXT_LEN, CTX_DIM)))
    # no LIEM params in the stock tree
    flat = ['/'.join(map(str, p)) for p, _ in
            jax.tree_util.tree_leaves_with_path(dparams)]
    assert not any('local' in f for f in flat)

    class Text:
        def __call__(self, tokens):
            t = jnp.asarray(tokens, jnp.float32)
            return jnp.stack([t * (i + 1) / 1000.0
                              for i in range(CTX_DIM)], axis=-1)

    def vae_decode_window(vp, latents, cache, first):
        variables = {'params': vp['params']}
        if cache:
            variables['cache'] = cache
        out, mut = vae.apply(variables, latents, True, first,
                             method=TinyVAE.decode, mutable=['cache'])
        return out, mut['cache']

    class Tok8(T5HashTokenizer):
        def __call__(self, texts, max_length=TEXT_LEN):
            return super().__call__(texts, max_length)

    bundle = CogT2VBundle(
        dit_apply=lambda p, x, t, c: dit.apply(p, x, t, c),
        vae_decode_window=vae_decode_window,
        text_encode=lambda p, tok: Text()(tok),
        tokenizer=Tok8(),
        params={'dit': dparams, 'vae': vparams, 'text': {}})
    pipe = CogVideoT2VPipeline(bundle, CogSamplerConfig(num_steps=4),
                               latent_hw=(h // 8, w // 8), latent_channels=4)
    out = pipe.sample('a red cube rotating', num_frames=9, seed=5)
    assert out.shape == (9, h, w, 3)
    assert out.dtype == np.uint8
    assert out.std() > 0
    out2 = pipe.sample('a red cube rotating', num_frames=9, seed=5)
    np.testing.assert_array_equal(out, out2)
