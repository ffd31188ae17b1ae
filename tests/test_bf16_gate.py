"""bf16 deployment-numerics gate.

The deployment config runs bf16 compute + bf16 weights with fp32 islands
(softmax, GN/LN statistics, solver state, guide-rescale stats — CLAUDE.md
invariants; reference parity stakes unet_v2v.py:320,356-360 fp32 softmax,
sampling.py:544,620 fp32 sampler state). Until round 2 that policy was
enforced by convention only; this test bounds the end-to-end drift of the
bf16 pipeline against the fp32 one on the tiny e2e model, so any future
change that drops an fp32 island (or adds a lossy cast on the solver path)
fails mechanically instead of silently costing PSNR.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from star_tpu.config import PipelineConfig, SamplerConfig
from star_tpu.models.clip.text import CLIPTextEncoder
from star_tpu.models.clip.tokenizer import HashTokenizer
from star_tpu.models.unet.unet import VideoUNetTrunk
from star_tpu.pipeline import ModelBundle, STARPipeline
from star_tpu.pipeline.build import cast_floating
from star_tpu.utils.metrics import psnr
from star_tpu.vae.svd_vae import Encoder, SVDTemporalVAE, TemporalDecoder

CTX = 32


def _make_pipeline(dtype, params):
    class TinyControlled(nn.Module):
        def setup(self):
            kw = dict(dim=32, dim_mult=(1, 2), head_dim=16,
                      num_heads_init_temporal=2, context_dim=CTX,
                      attn_scales=(1.0,), dtype=dtype)
            self.unet = VideoUNetTrunk(name='unet', **kw)
            self.controlnet = VideoUNetTrunk(name='controlnet',
                                             is_controlnet=True, **kw)

        def __call__(self, x, t, y, hint, cfg_pair=False):
            controls = self.controlnet(x, t, y, hint=hint, cfg_pair=cfg_pair)
            return self.unet(x, t, y, controls=controls, cfg_pair=cfg_pair)

    class TinyVAE(SVDTemporalVAE):
        def setup(self):
            self.encoder = Encoder(block_out_channels=(32, 32, 32, 32),
                                   dtype=self.dtype, name='encoder')
            self.decoder = TemporalDecoder(block_out_channels=(32, 32, 32, 32),
                                           layers_per_block=1,
                                           dtype=self.dtype, name='decoder')

    unet = TinyControlled()
    vae = TinyVAE(dtype=dtype)
    text = CLIPTextEncoder(width=CTX, heads=2, layers=2, vocab_size=1000,
                           dtype=dtype)

    class SmallVocabTok(HashTokenizer):
        def __call__(self, texts, context_length=77):
            out = super().__call__(texts, context_length)
            return np.clip(out % 1000, 0, 999)

    bundle = ModelBundle(
        unet_apply=lambda p, x, t, y, hint, **kw: unet.apply(p, x, t, y,
                                                             hint, **kw),
        vae_encode=lambda p, v, key: vae.apply(p, v, key,
                                               method=TinyVAE.encode),
        vae_decode=lambda p, z: vae.apply(p, z, method=TinyVAE.decode),
        text_encode=lambda p, tok: text.apply(p, tok),
        tokenizer=SmallVocabTok(),
        params=params)
    cfg = PipelineConfig(sampler=SamplerConfig(steps=3, solver_mode='normal'),
                         upscale=4, max_chunk_len=4, pad_grid=(144, 64))
    return STARPipeline(bundle, cfg), (unet, vae, text)


def _init_params():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    _, (unet, vae, text) = _make_pipeline(jnp.float32, None)
    up = unet.init(k1, jnp.zeros((1, 2, 18, 8, 4)),
                   jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 77, CTX)), jnp.zeros((1, 2, 18, 8, 4)))
    up = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.01 if 'head_conv' in '/'.join(map(str, p)) else x,
        up)
    vp = vae.init(k2, jnp.zeros((1, 2, 16, 16, 3)))
    tp = text.init(k3, jnp.zeros((1, 77), jnp.int32))
    return {'unet': up, 'vae': vp, 'text': tp}


def test_bf16_pipeline_tracks_fp32():
    params32 = _init_params()
    pipe32, _ = _make_pipeline(jnp.float32, params32)
    pipe16, _ = _make_pipeline(jnp.bfloat16,
                               cast_floating(params32, jnp.bfloat16))

    frames = (np.random.RandomState(3).uniform(0, 255, (6, 36, 16, 3))
              .astype(np.uint8))
    out32 = pipe32.enhance_a_video(frames, 'a red car', seed=11)
    out16 = pipe16.enhance_a_video(frames, 'a red car', seed=11)
    assert out32.shape == out16.shape == (6, 144, 64, 3)
    p = float(psnr(out16.astype(np.float32), out32.astype(np.float32),
                   max_val=255.0))
    # fp32-island policy holds ~36 dB on this config; an island regression
    # (e.g. bf16 softmax or bf16 solver state) drops it well below 30
    assert p >= 30.0, f'bf16 pipeline drifted from fp32: PSNR {p:.1f} dB'
