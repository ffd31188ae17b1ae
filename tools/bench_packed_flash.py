"""A/B the packed natural-layout flash kernel vs the unpacked path on chip.

Measures, at the CogVideoX DiT attention shape ([2, 9676, 48*64], the
9676-token CFG pair), the FULL data path each design implies:
  * old:    [B,S,H*D] -> reshape/transpose -> flash_attention -> transpose
            back (what dit.py did through round 2, incl. the XLA relayouts
            and 9676->9680 pads the r3 trace showed at ~180 ms/step)
  * packed: flash_attention_packed on the natural layout (kv_valid dead
            tail), optional bf16-exp2
Also sweeps block pairs for the packed kernel at S=9680.

    python tools/bench_packed_flash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
    import jax
    out = None
    for _ in range(2):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from star_tpu.ops.flash_attention import (flash_attention,
                                              flash_attention_packed)
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    b, s, h, d = 2, 9676, 48, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda k: jax.random.normal(k, (b, s, h * d), jnp.bfloat16)
    q, k_, v = mk(ks[0]), mk(ks[1]), mk(ks[2])

    def old_path(q, k, v):
        to4 = lambda t: t.reshape(b, s, h, d)
        out = flash_attention(to4(q), to4(k), to4(v))
        return out.reshape(b, s, h * d)

    print('[t] old path compile', flush=True)
    t_old = timed(jax.jit(old_path), q, k_, v)
    print(f'old unpacked: {t_old:.2f} ms', flush=True)

    for exp_bf16 in (False, True):
        for bq, bk in ((1936, 880), (1936, 440), (880, 880), (2880, 960)):
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk, e=exp_bf16:
                        flash_attention_packed(q, k, v, h, None, bq, bk,
                                               False, e))
            try:
                t = timed(f, q, k_, v)
                print(f'packed bq={bq} bk={bk} exp_bf16={exp_bf16}: '
                      f'{t:.2f} ms', flush=True)
            except Exception as e:
                print(f'packed bq={bq} bk={bk} exp_bf16={exp_bf16}: '
                      f'FAIL {type(e).__name__}: {str(e)[:200]}', flush=True)

    # numeric check packed vs old on chip
    o1 = jax.jit(old_path)(q, k_, v)
    o2 = jax.jit(lambda q, k, v: flash_attention_packed(
        q, k, v, h))(q, k_, v)
    import numpy as np
    diff = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32))
    print(f'max |old-packed| = {diff.max():.2e}', flush=True)


if __name__ == '__main__':
    main()
