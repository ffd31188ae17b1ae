"""A/B the fused GN+SiLU+conv3x3 Pallas kernel against XLA's fusion at the
SVD-VAE decoder scales, scan-amortized on the chip.

    python tools/bench_conv3x3.py [--cases k128,x128,k256,x256,k512,x512,il,ilx]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10


def timed_scan(fn_step, x0, label, flops):
    import jax

    def body(c, _):
        return fn_step(c), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=STEPS)
        return y

    print(f'[t] compile {label}', flush=True)
    out = run(x0)
    _ = jax.device_get(out.ravel()[0])
    times = []
    for _ in range(5):
        t0 = time.time()
        out = run(x0)
        _ = jax.device_get(out.ravel()[0])
        times.append(time.time() - t0)
    ms = sorted(times)[2] * 1e3 / STEPS
    tf = flops / (ms * 1e-3) / 1e12
    print(f'{label:8s} {ms:8.2f} ms/step  {tf:6.1f} TF/s', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cases', default='k128,x128,k256,x256,k512,x512,il,ilx')
    ap.add_argument('--frames', type=int, default=9)
    args = ap.parse_args()
    cases = set(args.cases.split(','))

    import jax
    import jax.numpy as jnp
    from star_tpu.ops.conv3x3 import (fused_gn_silu_conv3x3, _conv3x3_xla,
                                      channel_stats, gn_coeffs, interleave2x2)
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    shapes = {'128': (9, 720, 1280, 128), '256': (9, 360, 640, 256),
              '512': (9, 180, 320, 512),
              # UNet CFG-step ResBlock scales (16 = 8 frames x cfg pair)
              '640': (16, 46, 80, 640), '1280': (16, 24, 40, 1280)}
    for tag, (n, h, w, c) in shapes.items():
        if not (f'k{tag}' in cases or f'x{tag}' in cases
                or f'w{tag}' in cases or f'h{tag}' in cases):
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c),
                              jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                               jnp.float32) * 0.05)
        bias = jnp.zeros((c,), jnp.float32)
        gs = jnp.ones((c,), jnp.float32)
        gb = jnp.zeros((c,), jnp.float32)
        flops = 2 * n * h * w * 9 * c * c

        def kern_step(v):
            y, _ = fused_gn_silu_conv3x3(v, gs, gb, k, bias, residual=v,
                                         want_stats=True)
            return y * 0.05   # keep activations bounded across scan steps

        def wino_step(v):
            y, _ = fused_gn_silu_conv3x3(v, gs, gb, k, bias, residual=v,
                                         want_stats=True, impl='wino')
            return y * 0.05

        def winoh_step(v):
            y, _ = fused_gn_silu_conv3x3(v, gs, gb, k, bias, residual=v,
                                         want_stats=True, impl='winoh')
            return y * 0.05

        def xla_step(v):
            st = channel_stats(v)
            a, b = gn_coeffs(st, h * w * (c // 32), gs, gb, 32, 1e-6)
            y, _ = _conv3x3_xla(v, a, b, k, bias, v, True)
            return y * 0.05

        if f'k{tag}' in cases:
            timed_scan(kern_step, x, f'k{tag}', flops)
        if f'x{tag}' in cases:
            timed_scan(xla_step, x, f'x{tag}', flops)
        if f'w{tag}' in cases:
            timed_scan(wino_step, x, f'w{tag}', flops)
        if f'h{tag}' in cases:
            timed_scan(winoh_step, x, f'h{tag}', flops)

    if 'il' in cases or 'ilx' in cases:
        n, h, w, c = 9, 360, 640, 256
        x0 = jax.random.normal(jax.random.PRNGKey(10), (n, h, w, c),
                               jnp.bfloat16)

        # derive the other phases from the carry (closing over three 1GB
        # tensors bakes them as jit constants and stalls the compile)
        def il_step(v):
            out = interleave2x2(v, v * 0.5, v * 0.25, v * 0.125)
            return v + 0.001 * out[:, :h, :w, :]

        def ilx_step(v):
            t = jnp.stack([jnp.stack([v, v * 0.5], axis=3),
                           jnp.stack([v * 0.25, v * 0.125], axis=3)], axis=2)
            out = t.reshape(n, 2 * h, 2 * w, c)
            return v + 0.001 * out[:, :h, :w, :]

        if 'il' in cases:
            timed_scan(il_step, x0, 'il', 0)
        if 'ilx' in cases:
            timed_scan(ilx_step, x0, 'ilx', 0)

    # fused one-kernel upsample-conv vs phase-convs + interleave, at the
    # three SVD decoder upsample scales (cout == cin at all of them)
    from star_tpu.ops.conv3x3 import upsample_conv2x_fused
    from star_tpu.ops.upsample_conv import _M
    up_shapes = {'u512a': (args.frames, 90, 160, 512),
                 'u512b': (args.frames, 180, 320, 512),
                 'u256': (args.frames, 360, 640, 256)}
    for tag, (n, h, w, c) in up_shapes.items():
        if not (tag in cases or f'{tag}x' in cases):
            continue
        x = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, c),
                              jnp.bfloat16)
        k = (jax.random.normal(jax.random.PRNGKey(4), (3, 3, c, c),
                               jnp.float32) * 0.05)
        bias = jnp.zeros((c,), jnp.float32)
        ms = [jnp.asarray(m, jnp.float32) for m in _M]
        krs = jnp.stack([jnp.einsum('ap,bq,abio->pqio', ms[r], ms[s], k)
                         for r in (0, 1) for s in (0, 1)])
        flops = 2 * n * (2 * h) * (2 * w) * 4 * c * c

        def fused_step(v, krs=krs, bias=bias, h=h, w=w):
            out, st = upsample_conv2x_fused(v, krs, bias, want_stats=True)
            return v + 0.001 * out[:, :h, :w]

        def phase_step(v, krs=krs, bias=bias, n=n, h=h, w=w, c=c):
            xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            b32 = bias.astype(jnp.float32)
            phases = []
            for r in (0, 1):
                for s in (0, 1):
                    z = jax.lax.conv_general_dilated(
                        xp[:, r:r + h + 1, s:s + w + 1],
                        krs[2 * r + s].astype(v.dtype), (1, 1), 'VALID',
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                    phases.append((z + b32).astype(v.dtype))
            out, st = interleave2x2(*phases, want_stats=True)
            return v + 0.001 * out[:, :h, :w]

        if tag in cases:
            timed_scan(fused_step, x, tag, flops)
        if f'{tag}x' in cases:
            timed_scan(phase_step, x, f'{tag}x', flops)


if __name__ == '__main__':
    main()
