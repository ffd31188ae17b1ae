"""One-process A/B of the fused GN+SiLU+tconv3 kernel vs the XLA chain at
the UNet's three temporal-conv scales (scan-amortized, chip only).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_tconv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from star_tpu.ops.conv3x3 import channel_stats, gn_coeffs
from star_tpu.ops.fused_temporal_conv import (_tconv_xla, fused_gn_silu_tconv3)
from star_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

SCALES = [(2, 8, 14400, 320), (2, 8, 3680, 640), (2, 8, 960, 1280)]
N_SCAN = 20


def bench(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = f(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2] / N_SCAN * 1e3


def main():
    key = jax.random.PRNGKey(0)
    for b, f, n, c in SCALES:
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[1], (b, f, n, c), jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        kern = (jax.random.normal(ks[2], (3, 1, c, c), jnp.float32) * 0.05)
        cb = jnp.zeros((c,), jnp.float32)
        res = jax.random.normal(ks[3], (b, f, n, c), jnp.bfloat16)

        # 4-stage chain like TemporalConvBlockV2, scanned
        def chain_fused(x0):
            def step(xc, _):
                xx, stats = xc, None
                for i in range(4):
                    xx, stats = fused_gn_silu_tconv3(
                        xx, sc, bi, kern, cb, stats=stats,
                        residual=res if i == 3 else None,
                        want_stats=i < 3)
                return xx * 1e-3, None
            out, _ = jax.lax.scan(step, x0, None, length=N_SCAN)
            return out

        def chain_xla(x0):
            def step(xc, _):
                xx = xc
                for i in range(4):
                    st = channel_stats(xx.reshape(b, f * n, c))
                    a, bb = gn_coeffs(st, f * n * (c // 32), sc, bi, 32, 1e-5)
                    xx, _ = _tconv_xla(xx, a, bb, kern[:, 0], cb,
                                       res if i == 3 else None, False)
                return xx * 1e-3, None
            out, _ = jax.lax.scan(step, x0, None, length=N_SCAN)
            return out

        print(f'[t] compiling {c}', flush=True)
        t_f = bench(chain_fused, x)
        t_x = bench(chain_xla, x)
        print(f'C={c:5d} N={n:6d}: fused {t_f:7.3f} ms/chain-of-4  '
              f'xla {t_x:7.3f}  ({t_x / t_f:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
