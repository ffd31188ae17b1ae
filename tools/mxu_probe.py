"""Probe v5e MXU throughput at the flash kernel's matmul shapes to find the
kernel's ceiling: is a 64-deep contraction half rate? are 64/65 output lanes
half rate?  python tools/mxu_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    n = 1440
    reps = 64   # chain matmuls so dispatch overhead amortizes
    shapes = [
        ('qk  d=64 ', (n, 64), (64, n)),
        ('qk  d=128', (n, 128), (128, n)),
        ('pv  lanes=64 ', (n, n), (n, 64)),
        ('pv  lanes=128', (n, n), (n, 128)),
        ('sq  1440x1440', (n, n), (n, n)),
    ]
    for name, sa, sb in shapes:
        a = jnp.ones(sa, jnp.bfloat16)
        b = jnp.ones(sb, jnp.bfloat16)

        def run(a, b):
            out = jnp.zeros((sa[0], sb[1]), jnp.float32)
            for _ in range(reps):
                out = out + jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a = a + 1e-6  # defeat CSE
            return out

        f = jax.jit(run)
        o = f(a, b)
        _ = jax.device_get(o[0, 0])
        times = []
        for _ in range(5):
            t0 = time.time()
            o = f(a, b)
            _ = jax.device_get(o[0, 0])
            times.append(time.time() - t0)
        ms = sorted(times)[2] * 1e3
        flops = 2.0 * sa[0] * sa[1] * sb[1] * reps
        print(f'{name}  {ms:7.2f} ms  {flops / (ms * 1e-3) / 1e12:6.1f} TF/s',
              flush=True)


if __name__ == '__main__':
    main()
