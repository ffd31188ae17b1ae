"""Force the CPU backend for the quarantined negative-result kernel tests
(same as tests/conftest.py: the axon TPU plugin overrides JAX_PLATFORMS, and
the chip may be held by a bench process)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
