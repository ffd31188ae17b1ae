"""Sweep flash-attention block sizes on the real chip at the bench hot shape.

The CFG step's dominant Pallas cost is spatial self-attention at
[bh=80, S=14400, d=64] (7 instances, 54.7 ms each at (1024,1024)+pad in the
r2 trace). Run:
    python tools/sweep_flash.py [--bh 80] [--seq 14400]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bh', type=int, default=80)
    ap.add_argument('--seq', type=int, default=14400)
    ap.add_argument('--d', type=int, default=64)
    ap.add_argument('--iters', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.ops.flash_attention import flash_attention
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    bh, s, d = args.bh, args.seq, args.d
    # flash_attention takes [B, S, H, D]; use B=bh, H=1 to hit the 3d path
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = (jax.random.normal(kq, (bh, s, 1, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (bh, s, 1, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(kv, (bh, s, 1, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    flops = 4.0 * bh * s * s * d

    ref = None
    configs = [(1440, 1440), (2880, 1440), (2880, 720), (1440, 2880),
               (2880, 960), (4800, 720), (720, 1440)]
    for bq, bk in configs:
        try:
            fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, None, bq, bk))
            out = fn(q, k, v)
            _ = jax.device_get(out[0, 0, 0, 0])
            if ref is None:
                ref = np.asarray(out[:2].astype(jnp.float32))
            else:
                got = np.asarray(out[:2].astype(jnp.float32))
                err = np.abs(got - ref).max()
                assert err < 2e-2, (bq, bk, err)
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                out = fn(q, k, v)
                _ = jax.device_get(out[0, 0, 0, 0])
                times.append(time.time() - t0)
            ms = sorted(times)[len(times) // 2] * 1e3
            print(f'bq={bq:5d} bk={bk:5d}  {ms:8.2f} ms  '
                  f'{flops / (ms * 1e-3) / 1e12:6.1f} TF/s', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__} '
                  f'{str(e)[:120]}', flush=True)


if __name__ == '__main__':
    main()
