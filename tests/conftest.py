"""Test configuration: force the CPU backend with 8 virtual devices so
TP/CP/DP logic is testable without a TPU slice (SURVEY.md §4).

Must run before any jax backend initialization — pytest imports conftest
first, so env + config here is early enough. Note: the axon TPU plugin
overrides the JAX_PLATFORMS env var, so we use jax.config directly.
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, devs
    return devs[:8]
