"""Full-size end-to-end capstone on one chip: 8 frames 180x320 -> 720x1280
through STARPipeline.enhance_a_video in ONE jitted graph (bf16 zero weights:
real shapes/graph, meaningless pixels). Prints warm wall time + output fps.

    python tools/capstone_run.py [--frames 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.models.clip.text import CLIPTextEncoder
    from star_tpu.models.unet.unet import ControlledV2VUNet
    from star_tpu.pipeline.build import StarModels, build_pipeline
    from star_tpu.utils.cache import enable_compile_cache
    from star_tpu.vae.svd_vae import SVDTemporalVAE
    enable_compile_cache()

    print('[t] shapes', flush=True)
    dtype = jnp.bfloat16
    unet = ControlledV2VUNet(dtype=dtype)
    vae = SVDTemporalVAE(dtype=dtype)
    text = CLIPTextEncoder(dtype=dtype)
    key = jax.random.PRNGKey(0)
    zeros = lambda tree: jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype
                            if s.dtype == jnp.float32 else s.dtype), tree)
    up = zeros(jax.eval_shape(unet.init, key, jnp.zeros((1, 2, 18, 16, 4),
                                                        dtype),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 77, 1024), dtype),
                              jnp.zeros((1, 2, 18, 16, 4), dtype)))
    vp = zeros(jax.eval_shape(vae.init, key,
                              jnp.zeros((1, 2, 32, 32, 3), dtype)))
    tp = zeros(jax.eval_shape(text.init, key,
                              jnp.zeros((1, 77), jnp.int32)))
    models = StarModels(unet, up, vae, vp, text, tp)
    pipe = build_pipeline(models, allow_hash_tokenizer=True)

    frames = (np.random.RandomState(0)
              .uniform(0, 255, (args.frames, 180, 320, 3)).astype(np.uint8))
    print('[t] compile+first run', flush=True)
    t0 = time.time()
    out = pipe.enhance_a_video(frames, 'capstone', seed=666)
    print(f'[t] first (incl compile): {time.time() - t0:.1f} s, '
          f'out {out.shape}', flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = pipe.enhance_a_video(frames, 'capstone', seed=666)
        times.append(time.time() - t0)
    warm = sorted(times)[1]
    print(f'[t] warm: {warm:.2f} s = {args.frames / warm:.3f} output fps/chip'
          f' ({out.shape})', flush=True)


if __name__ == '__main__':
    main()
