"""Assemble a full STARPipeline from flax modules + params.

Mirrors VideoToVideo_sr.__init__ (video_to_video_model.py:20-72): CLIP text
tower, ControlledV2VUNet, logsnr-cosine-interp schedule, SVD temporal VAE.
Weights come from convert/ (torch checkpoints -> param trees) or random init
(for benchmarking / smoke tests — outputs are then meaningless but every
shape, dtype and graph is the real one).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models.clip.text import CLIPTextEncoder
from ..models.clip.tokenizer import default_tokenizer
from ..models.unet.unet import ControlledV2VUNet
from ..vae.svd_vae import SVDTemporalVAE
from .video_sr import ModelBundle, STARPipeline


@dataclasses.dataclass
class StarModels:
    unet: ControlledV2VUNet
    unet_params: Any
    vae: SVDTemporalVAE
    vae_params: Any
    text: CLIPTextEncoder
    text_params: Any


def init_random_models(key: jax.Array, dtype=jnp.bfloat16,
                       vae_decode_window: int = 3) -> StarModels:
    """Random-weight full-size models (for benchmarks and compile checks)."""
    k1, k2, k3 = jax.random.split(key, 3)
    unet = ControlledV2VUNet(dtype=dtype)
    vae = SVDTemporalVAE(dtype=dtype, decode_window=vae_decode_window)
    text = CLIPTextEncoder(dtype=dtype)

    x = jnp.zeros((1, 2, 18, 16, 4), dtype)
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 77, 1024), dtype)
    unet_params = jax.jit(unet.init)(k1, x, t, y, x)

    frames = jnp.zeros((1, 2, 32, 32, 3), dtype)
    vae_params = jax.jit(vae.init)(k2, frames)

    tokens = jnp.zeros((1, 77), jnp.int32)
    text_params = jax.jit(text.init)(k3, tokens)
    return StarModels(unet, unet_params, vae, vae_params, text, text_params)


def make_bundle(models: StarModels, tokenizer=None) -> ModelBundle:
    tokenizer = tokenizer or default_tokenizer()

    def unet_apply(x, t, y, hint):
        return models.unet.apply(models.unet_params, x, t, y, hint)

    def vae_encode(video, key):
        return models.vae.apply(models.vae_params, video, key,
                                method=SVDTemporalVAE.encode)

    def vae_decode(latents):
        return models.vae.apply(models.vae_params, latents,
                                method=SVDTemporalVAE.decode)

    def text_encode(tokens):
        return models.text.apply(models.text_params, tokens)

    return ModelBundle(unet_apply=unet_apply, vae_encode=vae_encode,
                       vae_decode=vae_decode, text_encode=text_encode,
                       tokenizer=tokenizer)


def build_pipeline(models: StarModels,
                   config: PipelineConfig = PipelineConfig(),
                   tokenizer=None) -> STARPipeline:
    return STARPipeline(make_bundle(models, tokenizer), config)
