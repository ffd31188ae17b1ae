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


def cast_floating(tree, dtype):
    """Cast floating leaves (weights) to `dtype`; ints/bools pass through."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def make_bundle(models: StarModels, tokenizer=None,
                param_dtype=None,
                allow_hash_tokenizer: bool = False) -> ModelBundle:
    """Params travel inside the bundle pytree (NOT closures — see
    ModelBundle docstring). param_dtype=jnp.bfloat16 halves weight HBM for
    inference. Without a real BPE asset this raises unless
    allow_hash_tokenizer=True (smoke/benchmark runs)."""
    tokenizer = tokenizer or default_tokenizer(
        allow_fallback=allow_hash_tokenizer)
    params = {'unet': models.unet_params, 'vae': models.vae_params,
              'text': models.text_params}
    if param_dtype is not None:
        params = cast_floating(params, param_dtype)

    return ModelBundle(
        unet_apply=lambda p, x, t, y, hint, **kw: models.unet.apply(
            p, x, t, y, hint, **kw),
        vae_encode=lambda p, v, key: models.vae.apply(
            p, v, key, method=SVDTemporalVAE.encode),
        vae_decode=lambda p, z: models.vae.apply(
            p, z, method=SVDTemporalVAE.decode),
        text_encode=lambda p, tok: models.text.apply(p, tok),
        tokenizer=tokenizer, params=params)


def build_pipeline(models: StarModels,
                   config: PipelineConfig = PipelineConfig(),
                   tokenizer=None, param_dtype=None,
                   allow_hash_tokenizer: bool = False) -> STARPipeline:
    return STARPipeline(make_bundle(models, tokenizer, param_dtype,
                                    allow_hash_tokenizer), config)
