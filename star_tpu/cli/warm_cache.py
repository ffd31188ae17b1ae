"""Compile-cache warming driver.

Pre-compiles the whole-clip pipeline graph for every production shape bucket
into the persistent XLA compile cache, so first-request latency at serving
time is dispatch-only. No weights are needed — graphs are lowered from
abstract (shape/dtype) params via jax.eval_shape, so this runs in seconds of
host time plus pure compile time per bucket.

The reference has no counterpart (eager torch pays no compile), but on TPU
the first compile of the full 720p graph costs minutes; a deployment warms
buckets offline once and every replica afterwards hits the disk cache
(utils/cache.py points JAX_COMPILATION_CACHE_DIR at a shared path).

    python -m star_tpu.cli.warm_cache --frames 8,16 --sizes 180x320,128x128 \
        [--upscale 4] [--decode_window 3]
"""

from __future__ import annotations

import time
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--frames', default='8',
                   help='comma list of clip lengths to warm')
    p.add_argument('--sizes', default='180x320',
                   help='comma list of input HxW buckets (pre-upscale)')
    p.add_argument('--upscale', type=int, default=4)
    p.add_argument('--decode_window', type=int, default=3)
    return p.parse_args()


def abstract_models(dtype=None, decode_window: int = 3):
    """StarModels whose params are ShapeDtypeStructs (no device memory) —
    enough for STARPipeline.warm, which only lowers/compiles."""
    import jax
    import jax.numpy as jnp
    from ..models.clip.text import CLIPTextEncoder
    from ..models.unet.unet import ControlledV2VUNet
    from ..pipeline.build import StarModels
    from ..vae.svd_vae import SVDTemporalVAE

    dtype = dtype or jnp.bfloat16
    unet = ControlledV2VUNet(dtype=dtype)
    vae = SVDTemporalVAE(dtype=dtype, decode_window=decode_window)
    text = CLIPTextEncoder(dtype=dtype)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    as_weight = lambda tree: jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype), tree)
    x = jax.ShapeDtypeStruct((1, 2, 18, 16, 4), dtype)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    y = jax.ShapeDtypeStruct((1, 77, 1024), dtype)
    unet_params = as_weight(jax.eval_shape(unet.init, key, x, t, y, x))
    frames = jax.ShapeDtypeStruct((1, 2, 32, 32, 3), dtype)
    vae_params = as_weight(jax.eval_shape(vae.init, key, frames))
    tokens = jax.ShapeDtypeStruct((1, 77), jnp.int32)
    text_params = as_weight(jax.eval_shape(text.init, key, tokens))
    return StarModels(unet, unet_params, vae, vae_params, text, text_params)


def main():
    args = parse_args()
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    from ..config import PipelineConfig
    from ..pipeline.build import build_pipeline
    from ..utils.logger import get_logger

    logger = get_logger()
    models = abstract_models(decode_window=args.decode_window)
    cfg = PipelineConfig(upscale=args.upscale,
                         vae_decode_window=args.decode_window)
    pipe = build_pipeline(models, config=cfg, allow_hash_tokenizer=True)

    frames = [int(x) for x in args.frames.split(',') if x]
    sizes = [tuple(int(v) for v in s.split('x')) for s in
             args.sizes.split(',') if s]
    for f in frames:
        for h, w in sizes:
            t0 = time.time()
            flops = pipe.warm(f, h, w)
            logger.info('warmed bucket f=%d %dx%d -> x%d: %.1f s, %.1f TFLOP',
                        f, h, w, args.upscale, time.time() - t0, flops / 1e12)


if __name__ == '__main__':
    main()
