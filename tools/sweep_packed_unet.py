"""Block-geometry sweep of the packed flash kernel at the UNet's dominant
spatial-attention shape [16, 14400, 320] (5 heads x d=64, whole-row lane=320)
— the r5 trace's top non-floor bucket (5x39.6 + 2x19.8 ms of the 1020 ms
step vs a ~32.3 ms/call qk-half-rate floor).

Scan-amortized in ONE process (per-call walls carry ~35 ms tunnel overhead):
each config chains q_{i+1} = out_i inside a jitted lax.scan, syncs via host
readback, reports ms/call. Also probes bq above the default VMEM cap via
fa._PACKED_VMEM_Q_BUDGET.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_packed_unet.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SCAN = 20


def main():
    import jax
    import jax.numpy as jnp
    import star_tpu.ops.flash_attention as fa
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    b, s, h, d = 16, 14400, 5, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h * d), jnp.bfloat16) * 0.3
    q, k_, v = mk(ks[0]), mk(ks[1]), mk(ks[2])

    def run_cfg(bq, bk, exp_bf16=False, budget=None):
        if budget is not None:
            fa._PACKED_VMEM_Q_BUDGET = budget
        else:
            fa._PACKED_VMEM_Q_BUDGET = 368640

        def step(carry, _):
            out = fa.flash_attention_packed(carry, k_, v, h, None, bq, bk,
                                            False, exp_bf16)
            return out, ()

        @jax.jit
        def scanned(q0):
            out, _ = jax.lax.scan(step, q0, None, length=N_SCAN)
            return out

        scanned(q)
        jax.device_get(scanned(q)[0, 0, 0])
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.device_get(scanned(q)[0, 0, 0])
            ts.append((time.time() - t0) / N_SCAN * 1e3)
        ts.sort()
        return ts[len(ts) // 2]

    ref = None
    for bq, bk, ebf, budget in [
        (960, 960, False, None),      # current default geometry
        (960, 480, False, None),
        (960, 720, False, None),
        (960, 1440, False, None),
        (960, 1920, False, None),
        (720, 960, False, None),
        (720, 1440, False, None),
        (480, 1440, False, None),
        (480, 2880, False, None),
        (960, 960, True, None),       # bf16 exp2 re-check at this shape
        (1440, 960, False, 552960),   # above-cap probes (VMEM risk)
        (1440, 720, False, 552960),
        (1440, 1440, False, 552960),
        (2880, 480, False, 1105920),
    ]:
        tag = f'bq={bq:5d} bk={bk:5d} exp_bf16={int(ebf)} budget={budget}'
        try:
            t = run_cfg(bq, bk, ebf, budget)
            if ref is None:
                ref = t
            print(f'{tag}: {t:7.2f} ms/call  ({t / ref:.3f}x)', flush=True)
        except Exception as e:
            print(f'{tag}: FAIL {type(e).__name__}: {str(e)[:160]}',
                  flush=True)
    fa._PACKED_VMEM_Q_BUDGET = 368640


if __name__ == '__main__':
    main()
