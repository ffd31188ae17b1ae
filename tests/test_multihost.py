"""Two-process jax.distributed rehearsal (localhost coordinator, CPU
backend): the multi-host bootstrap + hybrid mesh + cross-process collective
path that single-process CPU-mesh tests cannot reach."""

import os
import subprocess
import sys

def test_two_process_distributed_rehearsal():
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'multihost_rehearsal.py')
    env = {k: v for k, v in os.environ.items() if k != 'JAX_PLATFORMS'}
    out = subprocess.run([sys.executable, tool], capture_output=True,
                         timeout=900, env=env)
    text = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, text[-3000:]
    assert 'multihost_rehearsal: OK' in text
