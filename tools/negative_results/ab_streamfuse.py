"""One-process A/B of tools/negative_results/stream_fuse.py vs the XLA glue it replaces, at the
UNet temporal-transformer stream shapes (scan-amortized, chip only).

Site = what TemporalTransformerBlock does between attention calls:
    x_new = attn_out + x_resid
    gate  = sigmoid(w0*max_c + w1*mean_c)(x_new)
    out   = LayerNorm(gate * x_new)
XLA spelling = ops/norms.layer_norm + the TemporalLIEM jnp chain.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_streamfuse.py
"""

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_here)))
sys.path.insert(0, _here)

import jax
import jax.numpy as jnp

from star_tpu.ops.norms import layer_norm
from stream_fuse import fused_resid_liem_ln
from star_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

SHAPES = [(2, 8, 14400, 320), (2, 8, 3680, 640), (2, 8, 960, 1280)]
N_SCAN = 30


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
    for shape in SHAPES:
        c = shape[-1]
        ks = jax.random.split(key, 5)
        y = jax.random.normal(ks[1], shape, jnp.bfloat16)
        r = jax.random.normal(ks[2], shape, jnp.bfloat16)
        gw = jax.random.normal(ks[3], (2,), jnp.float32) * 0.3
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)

        def site_xla(y, r):
            x = y + r
            mx = jnp.max(x, axis=-1, keepdims=True)
            mn = jnp.mean(x, axis=-1, keepdims=True)
            g = jax.nn.sigmoid(
                (mx.astype(jnp.float32) * gw[0]
                 + mn.astype(jnp.float32) * gw[1]))
            xg = x * g.astype(x.dtype)
            return layer_norm(xg, sc, bi), x

        def chain(fn):
            def run(y0):
                def step(c_, _):
                    yc, rc = c_
                    n, xr = fn(yc, rc)
                    return (n * 1e-3 + yc * 0.5, xr), None
                (out, _), _ = jax.lax.scan(step, (y0, r), None, length=N_SCAN)
                return out
            return run

        print(f'[t] compiling {c}', flush=True)
        t_f = bench(chain(lambda a, b: fused_resid_liem_ln(
            a, sc, bi, resid=b, gate_w=gw)), y)
        t_x = bench(chain(site_xla), y)
        # plain LN + resid (norm3 site)
        t_f2 = bench(chain(lambda a, b: fused_resid_liem_ln(
            a, sc, bi, resid=b)), y)
        t_x2 = bench(chain(lambda a, b: (layer_norm(a + b, sc, bi), a + b)), y)
        print(f'C={c:5d}: gated+resid fused {t_f:7.3f} xla {t_x:7.3f} '
              f'({t_x / t_f:.2f}x) | plain+resid fused {t_f2:7.3f} '
              f'xla {t_x2:7.3f} ({t_x2 / t_f2:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
