"""Does XLA's habit of fusing GN stats/apply INTO convs cost MXU throughput?

Times the stage-0 decoder ResBlock conv [16,90,160,960]->320 three ways:
  plain      GN -> SiLU -> conv (XLA fuses freely, as in the full model)
  barrier    optimization_barrier between the normalized activations and the
             conv (forces the conv to run as a pure conv)
  conv-only  the conv alone (upper bound)

    python tools/probe_conv_fusion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from star_tpu.ops.norms import group_norm
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    bf, h, w, cin, cout = 16, 90, 160, 960, 320
    x = jax.random.normal(jax.random.PRNGKey(0), (bf, h, w, cin),
                          jnp.bfloat16)
    kern = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.02)
    scale = jnp.ones((cin,), jnp.float32)
    bias = jnp.zeros((cin,), jnp.float32)

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def plain(x):
        y = group_norm(x, scale, bias)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        return conv(y)

    def barrier(x):
        y = group_norm(x, scale, bias)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jax.lax.optimization_barrier(y)
        return conv(y)

    def conv_only(x):
        return conv(x)

    flops = 2.0 * bf * h * w * 9 * cin * cout
    for name, fn in (('plain', plain), ('barrier', barrier),
                     ('conv-only', conv_only)):
        f = jax.jit(fn)
        o = f(x)
        _ = jax.device_get(o[0, 0, 0, 0])
        times = []
        for _ in range(7):
            t0 = time.time()
            o = f(x)
            _ = jax.device_get(o[0, 0, 0, 0])
            times.append(time.time() - t0)
        ms = sorted(times)[3] * 1e3
        print(f'{name:10s} {ms:7.2f} ms  {flops / (ms * 1e-3) / 1e12:6.1f} '
              f'TF/s (incl ~35ms tunnel)', flush=True)


if __name__ == '__main__':
    main()
