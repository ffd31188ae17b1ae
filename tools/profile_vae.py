"""Per-op device-time breakdown of the SVD VAE decoder (and optionally the
encoder) at full size on the chip.

    python tools/profile_vae.py [--frames 9] [--decode_batch 3] [--encode]

Prints the per-HLO-category totals plus the top ops, same parser as
profile_bench.py (ONLY the 'XLA Ops' xplane line — see CLAUDE.md trap note).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_bench import parse_xplane  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=9)
    ap.add_argument('--h', type=int, default=720)
    ap.add_argument('--w', type=int, default=1280)
    ap.add_argument('--decode_batch', type=int, default=3)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--encode', action='store_true')
    ap.add_argument('--out', default='/tmp/vae_trace')
    ap.add_argument('--top', type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from star_tpu.vae.svd_vae import SVDTemporalVAE
    from star_tpu.utils.cache import enable_compile_cache
    from star_tpu.utils.profiling import sync, trace
    enable_compile_cache()

    dtype = jnp.bfloat16
    vae = SVDTemporalVAE(dtype=dtype, decode_batch=args.decode_batch)
    print('[t] init', flush=True)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 32, 32, 3), dtype))
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype
                            if s.dtype == jnp.float32 else s.dtype), shapes))

    f, hh, ww = args.frames, args.h, args.w
    if args.encode:
        video = jax.random.normal(jax.random.PRNGKey(2), (1, f, hh, ww, 3),
                                  dtype)
        fn = jax.jit(lambda p, v: vae.apply(p, v, None,
                                            method=SVDTemporalVAE.encode))
        arg = video
    else:
        z = jax.random.normal(jax.random.PRNGKey(1),
                              (1, f, hh // 8, ww // 8, 4), dtype)
        fn = jax.jit(lambda p, z: vae.apply(p, z,
                                            method=SVDTemporalVAE.decode))
        arg = z

    print('[t] compile+warm', flush=True)
    for _ in range(2):
        sync(fn(params, arg))
    print('[t] trace', flush=True)
    with trace(args.out):
        for _ in range(args.iters):
            sync(fn(params, arg))

    print('[t] parse', flush=True)
    totals, by_op = parse_xplane(args.out)
    n = args.iters
    print(json.dumps({k: round(v / 1e3 / n, 2) for k, v in
                      totals.most_common()}, indent=1))
    print(f'--- top {args.top} ops (ms/step) ---')
    for name, us in by_op.most_common(args.top):
        print(f'{us / 1e3 / n:9.2f}  {name}')


if __name__ == '__main__':
    main()
