"""Probe the SVD-VAE decoder's hot conv shapes on chip, scan-amortized.

Cases (select with --cases, comma list):
  conv128      bare 3x3 conv [9,720,1280,128]->128
  gnconv128    GN -> SiLU -> 3x3 conv, same shape (model spelling)
  conv256      bare 3x3 conv [9,360,640,256]->256
  conv512      bare 3x3 conv [9,180,320,512]->512
  up_phase     current phase-decomposed upsample 360x640x256 -> 720x1280
  up_dilated   the same as ONE lhs-dilated conv with the composed 4x4 kernel
  up_nointer   phase convs only, NO interleave (lower bound)

Each case runs inside a 10-step lax.scan so the tunnel overhead amortizes;
prints ms/step and TF/s.

    python tools/probe_vae_conv.py --cases conv128,gnconv128,up_phase,up_dilated
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
    print(f'{label:12s} {ms:8.2f} ms/step  {tf:6.1f} TF/s', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cases', default='conv128,gnconv128,up_phase,up_dilated')
    args = ap.parse_args()
    cases = set(args.cases.split(','))

    import jax
    import jax.numpy as jnp
    from star_tpu.ops.norms import group_norm
    from star_tpu.ops.upsample_conv import upsample_conv2x
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    def mkconv(cin, cout, key=1):
        k = (jax.random.normal(jax.random.PRNGKey(key), (3, 3, cin, cout),
                               jnp.bfloat16) * 0.02)

        def conv(v):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return conv, k

    shapes = {'conv128': (9, 720, 1280, 128), 'conv256': (9, 360, 640, 256),
              'conv512': (9, 180, 320, 512)}
    for name, (n, h, w, c) in shapes.items():
        if name not in cases:
            continue
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c),
                              jnp.bfloat16)
        conv, _ = mkconv(c, c)
        flops = 2.0 * n * h * w * 9 * c * c
        timed_scan(conv, x, name, flops)

    if 'gnconv128' in cases:
        n, h, w, c = 9, 720, 1280, 128
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c),
                              jnp.bfloat16)
        conv, _ = mkconv(c, c)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def gnconv(v):
            y = group_norm(v, scale, bias, eps=1e-6)
            return conv(jax.nn.silu(y))
        flops = 2.0 * n * h * w * 9 * c * c
        timed_scan(gnconv, x, 'gnconv128', flops)

    # --- upsample variants at 360x640x256 -> 720x1280x256 ---
    n, h, w, c = 9, 360, 640, 256
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
    k3 = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, c, c),
                            jnp.float32) * 0.02)
    b = jnp.zeros((c,), jnp.float32)
    up_flops = 2.0 * n * (2 * h) * (2 * w) * 4 * c * c

    def consume(out, x):
        # feed a quarter-slice back so scan iterations chain without
        # letting XLA hoist the op out of the loop
        return x + 0.001 * out[:, :h, :w, :]

    if 'up_phase' in cases:
        timed_scan(lambda v: consume(upsample_conv2x(v, k3, b), v), x0,
                   'up_phase', up_flops)

    if 'up_dilated' in cases:
        # nearest2x + conv3x3 SAME == lhs-dilated conv with the 4x4 kernel
        # k4[a, b] = sum_{p, q} k3[p, q] * ones2x2[a - p, b - q]
        # (full correlation of k3 with a 2x2 ones window), padding 2
        k4 = jnp.zeros((4, 4, c, c), jnp.float32)
        for p in range(3):
            for q in range(3):
                for da in range(2):
                    for db in range(2):
                        k4 = k4.at[p + da, q + db].add(k3[p, q])
        k4 = k4.astype(jnp.bfloat16)

        def up_dil(v):
            y = jax.lax.conv_general_dilated(
                v, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            return (y + b).astype(v.dtype)
        timed_scan(lambda v: consume(up_dil(v), v), x0, 'up_dilated',
                   up_flops)

    if 'up_nointer' in cases:
        from star_tpu.ops.upsample_conv import _M
        ms = [jnp.asarray(m, jnp.float32) for m in _M]

        def up_phases_only(v):
            xp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = 0.0
            for r in (0, 1):
                for s in (0, 1):
                    k_rs = jnp.einsum('ap,bq,abio->pqio', ms[r], ms[s],
                                      k3).astype(v.dtype)
                    z = jax.lax.conv_general_dilated(
                        xp[:, r:r + h + 1, s:s + w + 1], k_rs, (1, 1),
                        'VALID',
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                    acc = acc + (z + b).astype(v.dtype)
            return acc
        timed_scan(lambda v: v + 0.001 * up_phases_only(v), x0, 'up_nointer',
                   up_flops)


if __name__ == '__main__':
    main()
