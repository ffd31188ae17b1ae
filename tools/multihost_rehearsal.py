"""Two-process jax.distributed rehearsal on localhost (CPU backend).

Validates the multi-host bootstrap end to end without a TPU pod: process 0/1
each bring 2 virtual CPU devices, jax.distributed.initialize runs over a
localhost coordinator (the path ADVICE round-2 flagged — init must not touch
the backend first), make_hybrid_mesh lays data across processes with tensor
inside each, and a jitted TP-sharded matmul + cross-process psum execute.

    python tools/multihost_rehearsal.py                 # parent: spawns 2
    python tools/multihost_rehearsal.py --child i port  # internal
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(pid: int, port: int) -> None:
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from star_tpu.parallel import AXIS_DATA, AXIS_TENSOR
    from star_tpu.parallel.distributed import (init_distributed,
                                               make_hybrid_mesh)

    idx, cnt = init_distributed(coordinator=f'localhost:{port}',
                                num_processes=2, process_id=pid)
    assert idx == pid and cnt == 2, (idx, cnt)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    mesh = make_hybrid_mesh(data=-1, tensor=2)
    assert dict(mesh.shape) == {AXIS_DATA: 2, AXIS_TENSOR: 1,
                                'context': 1} or \
        mesh.shape[AXIS_DATA] * mesh.shape[AXIS_TENSOR] == 4

    # TP/DP groups: tensor axis must stay within one process (ICI-analog)
    arr = mesh.devices
    for row in arr.reshape(arr.shape[0], -1):
        assert len({d.process_index for d in row}) == 1, (
            'tensor/context group crosses processes')

    x_np = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    w_np = np.ones((4, 6), np.float32)
    xs = jax.device_put(x_np, NamedSharding(mesh, P(AXIS_DATA, None)))
    ws = jax.device_put(w_np, NamedSharding(mesh, P(None, AXIS_TENSOR)))

    @jax.jit
    def step(x, w):
        y = x @ w                       # TP matmul: XLA inserts collectives
        return y, jnp.sum(y)            # global reduction crosses processes

    y, total = step(xs, ws)
    want = x_np @ w_np
    np.testing.assert_allclose(float(total), want.sum(), rtol=1e-6)
    got = np.asarray(jax.device_get(
        jax.device_put(y, NamedSharding(mesh, P()))))   # gather to all
    np.testing.assert_allclose(got, want, rtol=1e-6)
    print(f'child {pid}: OK devices={len(jax.devices())} '
          f'mesh={dict(mesh.shape)}', flush=True)


def main() -> int:
    if '--child' in sys.argv:
        i = sys.argv.index('--child')
        child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return 0
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS',)}
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--child', str(i),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode()
        if p.returncode != 0 or f'child {i}: OK' not in text:
            ok = False
            print(f'--- child {i} rc={p.returncode} ---\n{text[-2000:]}')
        else:
            print(text.strip().splitlines()[-1])
    print('multihost_rehearsal:', 'OK' if ok else 'FAILED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
