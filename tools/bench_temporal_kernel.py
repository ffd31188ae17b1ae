"""Time the fused temporal-attention kernel at the UNet bench shapes.

    python tools/bench_temporal_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from star_tpu.ops.temporal_attention import temporal_attention
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # (b, f, n, heads, hd) — the three bench-config temporal scales
    # (90x160 latents; dims 320/640/1280, d=64; b=2 is the CFG pair)
    shapes = [
        (2, 8, 14400, 8, 512),    # stage-0 (init_temporal heads=8 @320ch)
        (2, 8, 3600, 10, 640),
        (2, 8, 900, 20, 1280),
    ]
    for b, f, n, h, hd in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        mk = lambda k: jax.random.normal(k, (b, f, n, hd), jnp.bfloat16)
        q, k_, v = mk(ks[0]), mk(ks[1]), mk(ks[2])
        fn = jax.jit(lambda q, k, v: temporal_attention(q, k, v, h))
        out = None
        for _ in range(2):
            out = fn(q, k_, v)
            jax.device_get(out[0, 0, 0, 0])
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(q, k_, v)
            jax.device_get(out[0, 0, 0, 0])
            ts.append(time.time() - t0)
        ts.sort()
        print(f'temporal b={b} f={f} n={n} h={h} hd={hd}: '
              f'{ts[len(ts) // 2] * 1e3:.2f} ms/call', flush=True)


if __name__ == '__main__':
    main()
