"""SVD VAE encode/decode throughput at full size on one chip.

    python tools/bench_vae.py [--frames 9] [--h 720] [--w 1280]
                              [--decode_batch 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax
    out = None
    for _ in range(2):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=9)
    ap.add_argument('--h', type=int, default=720)
    ap.add_argument('--w', type=int, default=1280)
    ap.add_argument('--decode_batch', type=int, default=2)
    ap.add_argument('--encode', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from star_tpu.vae.svd_vae import SVDTemporalVAE
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    dtype = jnp.bfloat16
    vae = SVDTemporalVAE(dtype=dtype, decode_batch=args.decode_batch)
    print('[t] init (eval_shape + zeros)', flush=True)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 32, 32, 3), dtype))
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype
                            if s.dtype == jnp.float32 else s.dtype), shapes))

    f, hh, ww = args.frames, args.h, args.w
    z = jax.random.normal(jax.random.PRNGKey(1), (1, f, hh // 8, ww // 8, 4),
                          dtype)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=SVDTemporalVAE.decode))
    print('[t] decode compile', flush=True)
    t = timed(dec, params, z)
    print(f'decode {f}f {hh}x{ww} decode_batch={args.decode_batch}: '
          f'{t * 1e3:.0f} ms = {f / t:.2f} fps', flush=True)

    if args.encode:
        video = jax.random.normal(jax.random.PRNGKey(2), (1, f, hh, ww, 3),
                                  dtype)
        enc = jax.jit(lambda p, v: vae.apply(p, v, None,
                                             method=SVDTemporalVAE.encode))
        print('[t] encode compile', flush=True)
        t = timed(enc, params, video)
        print(f'encode {f}f {hh}x{ww}: {t * 1e3:.0f} ms = {f / t:.2f} fps',
              flush=True)


if __name__ == '__main__':
    main()
