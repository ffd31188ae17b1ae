"""A/B the fused LIEM+LN Pallas kernel vs the unfused jnp chain at the UNet
bench shapes, scan-amortized in ONE process (per-call walls carry ~35 ms of
tunnel overhead).

    python tools/negative_results/bench_fused_ln.py
"""

from __future__ import annotations

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_here)))
sys.path.insert(0, _here)

STEPS = 50


def _time_scanned(fn, x, label):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            return y.astype(c.dtype), ()
        out, _ = lax.scan(body, x, None, length=STEPS)
        return out

    out = run(x)
    jax.device_get(out.reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = run(x)
        jax.device_get(out.reshape(-1)[0])
        ts.append(time.time() - t0)
    ts.sort()
    ms = ts[len(ts) // 2] * 1e3 / STEPS
    print(f'  {label}: {ms:.3f} ms/op', flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from fused_ln import fused_ln, fused_ln_reference
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # (shape, gated) — temporal stream [B,F,N,C] and spatial [BF,N,C] scales
    cases = [
        ((2, 8, 14400, 320), True),
        ((32, 14400, 320), False),
        ((2, 8, 960, 1280), True),
    ]
    if '--all' in sys.argv:
        cases += [((2, 8, 3680, 640), True), ((32, 3680, 640), False)]
    for shape, gated in cases:
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        gw = jnp.array([0.4, -0.3], jnp.float32) if gated else None
        print(f'shape={shape} gated={gated}', flush=True)
        a = _time_scanned(
            lambda t: fused_ln(t, scale, bias, 1e-5, gate_w=gw), x, 'pallas')
        b = _time_scanned(
            lambda t: fused_ln_reference(t, scale, bias, 1e-5, gate_w=gw),
            x, 'xla   ')
        gb = x.size * 2 * 2 / 1e9
        print(f'  -> {b / a:.2f}x; pallas at {gb / (a / 1e3):.0f} GB/s',
              flush=True)


if __name__ == '__main__':
    main()
