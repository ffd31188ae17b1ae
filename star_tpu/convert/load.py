"""Load converted checkpoints into StarModels bundles.

Layout on disk (produced by the convert_* CLIs below):
    {root}/unet       orbax tree for ControlledV2VUNet ({'unet':..,'controlnet':..})
    {root}/vae        orbax tree for SVDTemporalVAE
    {root}/clip       orbax tree for CLIPTextEncoder

Conversion entry points (run offline where the torch checkpoints live):
    python -m star_tpu.convert.cli unet  light_deg.pt out/unet
    python -m star_tpu.convert.cli vae   svd_vae.bin  out/vae
    python -m star_tpu.convert.cli clip  open_clip_pytorch_model.bin out/clip
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def load_star_models(root: str, dtype=jnp.bfloat16):
    from ..models.clip.text import CLIPTextEncoder
    from ..models.unet.unet import ControlledV2VUNet
    from ..pipeline.build import StarModels
    from ..vae.svd_vae import SVDTemporalVAE
    from .convert import load_params

    def _cast(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(a, dtype) if jnp.issubdtype(
                jnp.asarray(a).dtype, jnp.floating) else jnp.asarray(a), tree)

    unet_params = {'params': _cast(load_params(os.path.join(root, 'unet')))}
    vae_params = {'params': _cast(load_params(os.path.join(root, 'vae')))}
    text_params = {'params': _cast(load_params(os.path.join(root, 'clip')))}
    return StarModels(
        unet=ControlledV2VUNet(dtype=dtype), unet_params=unet_params,
        vae=SVDTemporalVAE(dtype=dtype), vae_params=vae_params,
        text=CLIPTextEncoder(dtype=dtype), text_params=text_params)
