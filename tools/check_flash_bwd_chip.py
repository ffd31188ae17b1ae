"""Compile + time the Pallas flash backward on the real chip at a training
shape (interpret mode does not check TPU tiling rules — this does).

    python tools/check_flash_bwd_chip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.ops.flash_attention import flash_attention
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # one frame of 720p spatial attention at training batch: bh=16 heads
    # folded, S=14400, d=64 (the shape 32-frame 720p training hits)
    bh, s, d = 16, 14400, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(kq, (bh, s, 1, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (bh, s, 1, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (bh, s, 1, d), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    print('[t] compile', flush=True)
    dq, dk, dv = gfn(q, k, v)
    _ = jax.device_get(dq[0, 0, 0, 0])
    for g, n in ((dq, 'dq'), (dk, 'dk'), (dv, 'dv')):
        arr = np.asarray(jax.device_get(g.astype(jnp.float32)))
        assert np.isfinite(arr).all(), n
        print(f'[t] {n} finite, |max|={np.abs(arr).max():.3f}', flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        dq, dk, dv = gfn(q, k, v)
        _ = jax.device_get(dq[0, 0, 0, 0])
        times.append(time.time() - t0)
    ms = sorted(times)[2] * 1e3
    flops = 10.0 * bh * s * s * d   # fwd recompute + 4 bwd matmuls
    print(f'[t] fwd+bwd {ms:.1f} ms  ~{flops / (ms * 1e-3) / 1e12:.1f} TF/s',
          flush=True)


if __name__ == '__main__':
    main()
