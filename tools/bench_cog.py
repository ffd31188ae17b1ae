"""CogVideoX-5B SR DiT denoise-step latency on one chip.

The Cog path's hot loop (SURVEY.md §3.3): 50 VPSDE-DPM++2M steps, each one
DiT forward on the CFG pair at the reference config — 42 layers, hidden
3072, 48 heads, patch 2, 7 latent frames of 60x90 latents (480x720 input,
the only resolution the reference supports — README.md:113) with LQ channel
concat and 226 text tokens: sequence 226 + 7*30*45 = 9676.

Measured like bench.py: N chained steps inside one jitted lax.scan, host
readback sync, median per-step time. Zero bf16 weights (real graph, fake
numbers).

    python tools/bench_cog.py [--scan 3] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scan', type=int, default=3)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--frames', type=int, default=7, help='latent frames')
    ap.add_argument('--profile', default=None,
                    help='trace dir: print a per-op device-time breakdown '
                         'instead of the latency line')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from star_tpu.models.dit.dit import CogVideoDiT
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    model = CogVideoDiT(dtype=jnp.bfloat16)
    b, t, h, w = 1, args.frames, 60, 90          # 480x720 / 8 VAE
    x = jnp.zeros((2 * b, t, h, w, 32), jnp.bfloat16)   # CFG pair, z||lq
    ti = jnp.full((2 * b,), 499, jnp.int32)
    ctx = jnp.zeros((2 * b, 226, 4096), jnp.bfloat16)

    print('[t] init shapes', flush=True)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, ti, ctx)
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if s.dtype == jnp.float32 else s.dtype), shapes))

    def run(p, x0):
        def one_step(c, _):
            v = model.apply(p, c, ti, ctx)
            # DynamicCFG combine + euler-ish update on the noisy half
            half = c[..., :16].astype(jnp.float32)
            vu, vc = v[:b].astype(jnp.float32), v[b:].astype(jnp.float32)
            nxt = (half[:b] - 0.05 * (vu + 6.0 * (vc - vu))).astype(c.dtype)
            nxt2 = jnp.concatenate([nxt, nxt], axis=0)
            return jnp.concatenate([nxt2, c[..., 16:]], axis=-1), None
        out, _ = jax.lax.scan(one_step, x0, None, length=args.scan)
        return out

    fwd = jax.jit(run)
    print('[t] compile+warm', flush=True)
    for _ in range(2):
        out = fwd(params, x)
        _ = jax.device_get(out[0, 0, 0, 0, 0])
    if args.profile:
        from profile_bench import parse_xplane
        from star_tpu.utils.profiling import sync, trace
        print('[t] trace', flush=True)
        with trace(args.profile):
            sync(fwd(params, x))
        totals, by_op = parse_xplane(args.profile)
        n = args.scan
        print({k: round(v / 1e3 / n, 1) for k, v in totals.most_common()},
              flush=True)
        for name, us in by_op.most_common(20):
            print(f'{us / 1e3 / n:8.2f}  {name[:180]}', flush=True)
        return
    print('[t] measure', flush=True)
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        out = fwd(params, x)
        _ = jax.device_get(out[0, 0, 0, 0, 0])
        times.append(time.time() - t0)
    times.sort()
    step_ms = times[len(times) // 2] * 1e3 / args.scan
    print(f'[t] cfg_dit_step_ms_{t}f_480x720: {step_ms:.1f} ms '
          f'(50-step clip denoise ~ {step_ms * 50 / 1e3:.1f} s)', flush=True)


if __name__ == '__main__':
    main()
