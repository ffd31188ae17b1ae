"""One-process A/B of the VAE decoder: explicit AlphaBlender blend vs the
algebraic fold into the temporal conv2 epilogue
(STAR_TPU_VAE_BLEND_FOLD trace-time knob, svd_vae.SpatioTemporalResBlock).

The fold removes, per SpatioTemporalResBlock, one full elementwise blend
pass over the block's activation ((1-a)*h_sp + a*h_tm reads two tensors and
writes one — ~6.4 GB of HBM traffic per block at the 128ch 720p scale) and
the separate channel_stats re-read for the next block's GroupNorm: since
the temporal shortcut IS h_sp, (1-a)*h_sp + a*(conv2+h_sp) == h_sp +
a*conv2, so scaling conv2's kernel/bias by `a` makes the fused temporal
kernel's residual epilogue emit the blended output (and its per-frame
stats) directly. Standalone kernel A/Bs understate in-graph effects
(CLAUDE.md) — this measures the full decode graph both ways in ONE process.

    python tools/ab_blend_fold.py [--frames 9] [--decode_batch 3] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=9)
    ap.add_argument('--h', type=int, default=720)
    ap.add_argument('--w', type=int, default=1280)
    ap.add_argument('--decode_batch', type=int, default=3)
    ap.add_argument('--iters', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from star_tpu.vae.svd_vae import SVDTemporalVAE
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    dtype = jnp.bfloat16
    vae = SVDTemporalVAE(dtype=dtype, decode_batch=args.decode_batch)
    print('[t] init (eval_shape + zeros)', flush=True)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 32, 32, 3), dtype))
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype
                            if s.dtype == jnp.float32 else s.dtype), shapes))
    z = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, args.frames, args.h // 8, args.w // 8, 4), dtype)

    fns, outs = {}, {}
    for name, flag in (('explicit', '0'), ('folded', '1')):
        os.environ['STAR_TPU_VAE_BLEND_FOLD'] = flag
        fns[name] = jax.jit(
            (lambda p, zz: vae.apply(p, zz, method=SVDTemporalVAE.decode)))
        print(f'[t] compile {name}', flush=True)
        out = fns[name](params, z)
        outs[name] = jax.device_get(out)
        print(f'[t] {name} warm ok {out.shape}', flush=True)
    import numpy as np
    d = np.max(np.abs(outs['explicit'].astype(np.float32)
                      - outs['folded'].astype(np.float32)))
    print(f'[t] max |explicit - folded| = {d:.4f} '
          f'(bf16 blend-order tolerance)', flush=True)

    times = {k: [] for k in fns}
    for i in range(args.iters):
        for name, fn in fns.items():
            t0 = time.time()
            out = fn(params, z)
            jax.device_get(out.ravel()[0])
            times[name].append(time.time() - t0)
    f = args.frames
    for name, ts in times.items():
        ts.sort()
        med = ts[len(ts) // 2]
        print(f'{name}: {med * 1e3:.1f} ms ({f / med:.2f} fps) '
              f'all={["%.0f" % (t * 1e3) for t in ts]}', flush=True)


if __name__ == '__main__':
    main()
