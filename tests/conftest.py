"""Test configuration: force an 8-device virtual CPU platform.

This is the TPU-native substitute for testing multi-device code without a
pod (SURVEY.md §4): all sharding/pjit tests run against
xla_force_host_platform_device_count=8.

Note: the environment's sitecustomize imports jax at interpreter startup
(registering the 'axon' TPU backend), so env vars alone are too late —
we must override via jax.config before any backend is initialized.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

assert jax.devices()[0].platform == 'cpu', (
    'tests must run on the virtual CPU platform')
assert len(jax.devices()) == 8, 'expected 8 virtual CPU devices'

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Cap host memory across the suite: compiled executables from the
    heavyweight full-model tests otherwise accumulate in one process and
    can abort the interpreter near the end of the run."""
    yield
    jax.clear_caches()
    import gc
    gc.collect()
