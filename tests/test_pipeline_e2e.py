"""End-to-end pipeline test on tiny models: frames -> enhanced frames.

This is the CPU-sized analog of the reference's toy-clip gate
(SURVEY.md §4): random weights, so it checks plumbing, shapes, dtype islands,
determinism — not fidelity (that needs converted checkpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # ~10 min on the 1-core host: NOT in the quick tier
from flax import linen as nn

from star_tpu.config import PipelineConfig, SamplerConfig
from star_tpu.models.clip.text import CLIPTextEncoder
from star_tpu.models.clip.tokenizer import HashTokenizer
from star_tpu.models.unet.unet import VideoUNetTrunk
from star_tpu.pipeline import ModelBundle, STARPipeline
from star_tpu.vae.svd_vae import Encoder, SVDTemporalVAE, TemporalDecoder

CTX = 32


class TinyControlled(nn.Module):
    def setup(self):
        kw = dict(dim=32, dim_mult=(1, 2, 4, 4), head_dim=16,
                  num_heads_init_temporal=2, context_dim=CTX)
        self.unet = VideoUNetTrunk(name='unet', **kw)
        self.controlnet = VideoUNetTrunk(name='controlnet', is_controlnet=True,
                                         **kw)

    def __call__(self, x, t, y, hint, cfg_pair=False):
        controls = self.controlnet(x, t, y, hint=hint, cfg_pair=cfg_pair)
        return self.unet(x, t, y, controls=controls, cfg_pair=cfg_pair)


class TinyVAE(SVDTemporalVAE):
    def setup(self):
        self.encoder = Encoder(block_out_channels=(32, 32, 32, 32),
                               dtype=self.dtype, name='encoder')
        self.decoder = TemporalDecoder(block_out_channels=(32, 32, 32, 32),
                                       layers_per_block=1, dtype=self.dtype,
                                       name='decoder')


@pytest.fixture(scope='module')
def pipeline():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    unet = TinyControlled()
    up = unet.init(k1, jnp.zeros((1, 2, 18, 8, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 77, CTX)), jnp.zeros((1, 2, 18, 8, 4)))
    # non-degenerate outputs: bump the zero-init head
    up = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.01 if 'head_conv' in '/'.join(map(str, p)) else x, up)

    vae = TinyVAE()
    vp = vae.init(k2, jnp.zeros((1, 2, 16, 16, 3)))

    text = CLIPTextEncoder(width=CTX, heads=2, layers=2, vocab_size=1000)
    tp = text.init(k3, jnp.zeros((1, 77), jnp.int32))

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
        params={'unet': up, 'vae': vp, 'text': tp})

    cfg = PipelineConfig(sampler=SamplerConfig(steps=4, solver_mode='normal'),
                         upscale=4, max_chunk_len=4, pad_grid=(144, 64))
    return STARPipeline(bundle, cfg)


def test_enhance_a_video_end_to_end(pipeline):
    frames = (np.random.RandomState(0).uniform(0, 255, (6, 36, 16, 3))
              .astype(np.uint8))
    out = pipeline.enhance_a_video(frames, 'a cat on a skateboard', seed=666)
    assert out.shape == (6, 144, 64, 3)
    assert out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
    assert out.std() > 0  # not a constant image


def test_enhance_is_deterministic(pipeline):
    frames = (np.random.RandomState(1).uniform(0, 255, (6, 36, 16, 3))
              .astype(np.uint8))
    a = pipeline.enhance_a_video(frames, 'prompt', seed=123)
    b = pipeline.enhance_a_video(frames, 'prompt', seed=123)
    np.testing.assert_array_equal(a, b)


def test_chunked_path_runs(pipeline):
    # 6 frames with max_chunk_len=4 -> single absorbing window (6 < 4*1.25+4);
    # use 12 frames -> windows (0,4),(2,6),(4,12)? make_chunks(12,4):
    # window 4, overlap 2 -> (0,4),(2,6),(4,8),(6,12)
    frames = (np.random.RandomState(2).uniform(0, 255, (12, 36, 16, 3))
              .astype(np.uint8))
    out = pipeline.enhance_a_video(frames, 'chunked', seed=7)
    assert out.shape == (12, 144, 64, 3)


def test_warm_compiles_bucket_from_abstract_params(pipeline):
    """warm() AOT-compiles a shape bucket without weights or execution
    (deployment cache-warming path, cli/warm_cache.py)."""
    import copy
    p_abs = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                         pipeline.models.params)
    shadow = copy.copy(pipeline)
    shadow.models = ModelBundle(**{**pipeline.models.__dict__,
                                   'params': p_abs})
    flops = shadow.warm(6, 36, 16)
    assert flops >= 0.0
