"""Profile the bench CFG-denoise step on the TPU and print a per-HLO-category
device-time breakdown (uses utils.profiling.trace + xprof xplane parsing).

Run on the real chip (background; compile through the tunnel is slow):
    python tools/profile_bench.py [--iters 3] [--out /tmp/star_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def classify(op_name: str) -> str:
    """Categorize a full HLO instruction string.

    CLASSIFICATION TRAPS (both bit the r2/r3 parses): (1) substring tests on
    the whole line match operand text — 'conv' hits 'convert_*' fusion names
    and a '%custom-call.N' OPERAND makes an elementwise fusion look like a
    pallas call; (2) spatial convs mostly run inside kOutput fusions whose
    LHS is named 'convert_reduce_fusion' (conv + GN-stat epilogue), so only
    a [3,3,Cin,Cout]/[7,7,..] kernel operand identifies them. Classify by
    the op KIND after ' = ' and use the kernel-shape test for fused convs.
    """
    lhs, _, rhs = op_name.partition(' = ')
    m = re.search(r'\)?\s*([a-z][a-z\-]+)\(', rhs)
    kind = m.group(1) if m else rhs.split('(')[0].split()[-1] if rhs else ''
    if kind == 'custom-call':
        return 'custom-call (pallas)'
    if kind == 'convolution' or (kind == 'fusion'
                                 and re.search(r'\[[37],[37],\d+,\d+\]', rhs)):
        return 'conv-spatial'
    if kind == 'dot' or (kind == 'fusion'
                         and ('convolution' in lhs or 'dot' in lhs)):
        return 'matmul/1x1'
    if kind == 'fusion':
        return 'fusion (elementwise/reduce)'
    if kind in ('copy', 'transpose', 'bitcast', 'reshape'):
        return 'copy/transpose'
    if kind.startswith('reduce'):
        return 'reduce'
    if kind.startswith('all-') or 'collective' in kind:
        return 'collective'
    return 'other'


def parse_xplane(trace_dir: str):
    """Sum device op durations from the xplane protobuf by op name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane.pb under {trace_dir}'
    totals = collections.Counter()
    by_op = collections.Counter()
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, 'rb') as fh:
            xspace.ParseFromString(fh.read())
        for plane in xspace.planes:
            if 'TPU' not in plane.name and 'device' not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                # ONLY the core-busy 'XLA Ops' line: async DMA lines carry
                # copy-start events whose duration spans their whole
                # in-flight window (overlapping compute), which inflated the
                # r2 category totals ~4x
                if line.name != 'XLA Ops':
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    dur_us = ev.duration_ps / 1e6
                    totals[classify(name)] += dur_us
                    by_op[name] += dur_us
    return totals, by_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--out', default='/tmp/star_trace')
    ap.add_argument('--dump', default=None,
                    help='write the full per-op ms/step table to this JSON')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from star_tpu.models.unet.unet import ControlledV2VUNet
    from star_tpu.utils.cache import enable_compile_cache
    from star_tpu.utils.profiling import sync, trace
    enable_compile_cache()

    print('[t] build', flush=True)
    model = ControlledV2VUNet(dtype=jnp.bfloat16)
    b, f, h, w = 1, 8, 90, 160
    x = jnp.zeros((b, f, h, w, 4), jnp.bfloat16)
    t = jnp.full((b,), 899, jnp.int32)
    y = jnp.zeros((2 * b, 77, 1024), jnp.bfloat16)   # CFG pair (cfg_pair=True)
    hint = jnp.zeros((b, f, h, w, 4), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, y[:b],
                            hint)
    # bf16 weights to match bench.py's deployment config (fp32 weights double
    # the streaming traffic and dominate the trace with converts)
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if s.dtype == jnp.float32 else s.dtype), shapes))
    fwd = jax.jit(lambda p, *a: model.apply(p, *a, cfg_pair=True))

    print('[t] compile+warm', flush=True)
    for _ in range(2):
        sync(fwd(params, x, t, y, hint))
    print('[t] trace', flush=True)
    with trace(args.out):
        for _ in range(args.iters):
            sync(fwd(params, x, t, y, hint))

    print('[t] parse', flush=True)
    totals, by_op = parse_xplane(args.out)
    n = args.iters
    print(json.dumps({k: round(v / 1e3 / n, 2) for k, v in
                      totals.most_common()}, indent=1))
    print('--- top 25 ops (ms/step) ---')
    for name, us in by_op.most_common(25):
        print(f'{us / 1e3 / n:9.2f}  {name}')
    if args.dump:
        with open(args.dump, 'w') as fh:
            json.dump([{'ms': round(us / 1e3 / n, 3),
                        'cat': classify(name), 'op': name}
                       for name, us in by_op.most_common()], fh, indent=0)
        print(f'[t] dumped {len(by_op)} ops to {args.dump}')


if __name__ == '__main__':
    main()
