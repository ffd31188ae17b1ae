"""Profile ONE TemporalTransformer at the stage-0 bench shape to localize
the fp32 broadcast/reshape/copy family seen in the full-step trace.

    python tools/profile_temporal.py [--variant base]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/star_trace_temporal')
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--module', default='temporal_tx',
                    choices=['temporal_tx', 'temporal_conv', 'resblock'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from star_tpu.models.unet.blocks import (ResBlock, TemporalConvBlockV2,
                                             TemporalTransformer)
    from star_tpu.utils.cache import enable_compile_cache
    from star_tpu.utils.profiling import sync, trace
    from profile_bench import parse_xplane
    enable_compile_cache()

    if args.module == 'temporal_tx':
        mod = TemporalTransformer(320, 8, 64, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 90, 160, 320), jnp.bfloat16)
    elif args.module == 'temporal_conv':
        mod = TemporalConvBlockV2(320, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 90, 160, 320), jnp.bfloat16)
    else:
        mod = ResBlock(320, dtype=jnp.bfloat16)
    if args.module == 'resblock':
        xr = jnp.zeros((16, 90, 160, 320), jnp.bfloat16)
        emb = jnp.zeros((16, 1280), jnp.bfloat16)
        shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), xr, emb, 8)
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16
                                if s.dtype == jnp.float32 else s.dtype),
            shapes)
        fwd = jax.jit(lambda p, x, e: mod.apply(p, x, e, 8))
        print('[t] compile', flush=True)
        sync(fwd(params, xr, emb))
        sync(fwd(params, xr, emb))
        print('[t] trace', flush=True)
        with trace(args.out):
            for _ in range(args.iters):
                sync(fwd(params, xr, emb))
        totals, by_op = parse_xplane(args.out)
        n = args.iters
        print({k: round(v / 1e3 / n, 2) for k, v in totals.most_common()})
        for name, us in by_op.most_common(15):
            print(f'{us / 1e3 / n:8.3f}  {name[:160]}')
        return

    shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if s.dtype == jnp.float32 else s.dtype), shapes)
    fwd = jax.jit(lambda p, x: mod.apply(p, x))
    print('[t] compile', flush=True)
    sync(fwd(params, x))
    sync(fwd(params, x))
    print('[t] trace', flush=True)
    with trace(args.out):
        for _ in range(args.iters):
            sync(fwd(params, x))
    totals, by_op = parse_xplane(args.out)
    n = args.iters
    print({k: round(v / 1e3 / n, 2) for k, v in totals.most_common()})
    for name, us in by_op.most_common(15):
        print(f'{us / 1e3 / n:8.3f}  {name[:160]}')


if __name__ == '__main__':
    main()
