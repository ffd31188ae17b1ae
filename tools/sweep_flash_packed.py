"""Sweep the PACKED flash kernel's block geometry + exp dtype at the two
flagship hot shapes, all in ONE process (cross-process timings drift —
CLAUDE.md):

  unet: [16, 14400, 320], 5 heads d=64 -> whole-row lane=320 blocks, hpb=5
        (5 calls x 39.6 ms in the r5 trace; MXU floor ~32.3 ms at qk
        half-depth, so ~7 ms/call of exposed VPU/overhead to attack)
  cog:  [2, 9680, 3072], 48 heads d=64, kv_valid=9676 (masked tail),
        prescaled -> lane=128 head-pair blocks, hpb=2
        (918 ms/step total vs ~737 floor, ROADMAP item 3)

Run on the chip:
    python tools/sweep_flash_packed.py --which unet
    python tools/sweep_flash_packed.py --which cog
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--which', choices=['unet', 'cog'], default='unet')
    ap.add_argument('--iters', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import importlib
    # the ops package re-exports a function named flash_attention that
    # shadows the submodule on every `import ... as` form; go via sys.modules
    fa = importlib.import_module('star_tpu.ops.flash_attention')
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    if args.which == 'unet':
        b, s, heads, d = 16, 14400, 5, 64
        kv_valid = None
        prescaled = False
        # (bq, bk, exp_bf16, budget_override)
        configs = [
            (2880, 960, False, None),      # current production pick
            (2880, 960, True, None),       # bf16 exp2 at hpb=5
            (960, 480, False, None),
            (960, 1440, False, None),      # wider kv block
            (1440, 960, False, 475000),    # taller q block (needs budget)
            (1440, 720, False, 475000),
            (720, 960, False, None),
            (2880, 960, True, 475000),     # tall q + bf16 exp
        ]
    else:
        b, s, heads, d = 2, 9680, 48, 64
        kv_valid = 9676
        prescaled = True
        configs = [
            (2880, 960, False, None),      # current pick -> 1936/880
            (2880, 960, True, None),
            (1936, 1936, False, None),
            (880, 880, False, None),
            (880, 1936, False, None),
            (1936, 640, False, None),      # picker -> minimal-pad 608
            (2880, 1760, False, None),
            (1936, 880, True, None),
        ]

    hd = heads * d
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    qn = (jax.random.normal(kq, (b, s, hd), jnp.float32) * 0.5).astype(jnp.bfloat16)
    kn = (jax.random.normal(kk, (b, s, hd), jnp.float32) * 0.5).astype(jnp.bfloat16)
    vn = (jax.random.normal(kv_, (b, s, hd), jnp.float32) * 0.5).astype(jnp.bfloat16)
    if kv_valid is not None:
        # dead tail rows must not influence the output
        kn = kn.at[:, kv_valid:].set(7.0)
        vn = vn.at[:, kv_valid:].set(7.0)
    flops = 4.0 * b * heads * s * (kv_valid or s) * d

    ref = None
    results = []
    for bq, bk, ebf, budget in configs:
        tag = f'bq={bq} bk={bk} ebf={int(ebf)} budget={budget or "std"}'
        if budget:
            os.environ['STAR_FLASH_PACKED_BQ_BUDGET'] = str(budget)
        else:
            os.environ.pop('STAR_FLASH_PACKED_BQ_BUDGET', None)
        try:
            fn = jax.jit(lambda q, k, v, bq=bq, bk=bk, ebf=ebf:
                         fa.flash_attention_packed(
                             q, k, v, heads, None, bq, bk, False, ebf,
                             kv_valid, prescaled))
            out = fn(qn, kn, vn)
            _ = jax.device_get(out[0, 0, 0])
            got = np.asarray(out[:1, :64].astype(jnp.float32))
            if ref is None:
                ref = got
            else:
                err = np.abs(got - ref).max()
                if err > 3e-2:
                    print(f'[t] {tag}: WRONG err={err}', flush=True)
                    continue
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                out = fn(qn, kn, vn)
                _ = jax.device_get(out[0, 0, 0])
                times.append(time.time() - t0)
            times.sort()
            med = times[len(times) // 2]
            print(f'[t] {tag}: {med * 1e3:.1f} ms wall '
                  f'({flops / med / 1e12:.0f} TF/s incl ~tunnel)', flush=True)
            results.append((med, tag))
        except Exception as e:
            print(f'[t] {tag}: FAIL {type(e).__name__}: {str(e)[:200]}',
                  flush=True)
    results.sort()
    for med, tag in results:
        print(f'{med * 1e3:8.1f} ms  {tag}')


if __name__ == '__main__':
    main()
