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
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
# 8 virtual device threads share one physical core here: XLA CPU's
# default collective rendezvous deadline (warn 20 s / abort 40 s) can
# fire spuriously when the host is loaded (observed: the fused GAN step's
# all-gather aborting with 5/8 threads arrived). Generous deadlines keep
# the collective tests load-tolerant; real deadlocks still abort.
if 'collective_call_terminate_timeout' not in flags:
    flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=120'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=900')
os.environ['XLA_FLAGS'] = flags
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: the heavyweight full-model tests (fused GAN
# step, full eval pipeline) each cost minutes of XLA CPU compile on this
# host; repeat suite runs hit the cache instead. Only big compiles are
# cached (>10 s) to keep the directory small. Shared helper so tests /
# bench / CLIs agree on the location.
import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from c2matching_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)
enable_persistent_cache(min_compile_secs=10.0)

assert jax.devices()[0].platform == 'cpu', (
    'tests must run on the virtual CPU platform')
assert len(jax.devices()) == 8, 'expected 8 virtual CPU devices'

import pytest  # noqa: E402


#: opt-in markers — skipped unless named with -m or selected by node id:
#: - dp_trace: the full-size DP-equivalence pair costs ~13 min
#:   (2026-08-20, post auto-unroll; was ~40 min) of Python tracing +
#:   lowering on this 1-core host; the default run covers the same
#:   property with the reduced smoke in test_parallel_production.py.
#: - convergence: hundreds of torch iterations through the reference
#:   stack (test_convergence_parity.py); trajectories pinned in
#:   PARITY.md when run.
OPT_IN_MARKERS = ('dp_trace', 'convergence')


def pytest_collection_modifyitems(config, items):
    """Opt-in heavyweight tests are skipped unless the user names the
    marker (``-m dp_trace``, ``-m 'convergence or fast'`` ...) or
    selects such a test directly by node id."""
    m_expr = config.getoption('-m') or ''
    # an arg like path/to/test_x.py::test_name is an explicit ask — honor it
    explicit = {a.replace(str(config.rootpath) + '/', '')
                for a in config.args if '::' in a}
    for marker in OPT_IN_MARKERS:
        if marker in m_expr:
            continue
        skip = pytest.mark.skip(
            reason=f'opt-in heavyweight test: run with -m {marker}')
        for item in items:
            if marker in item.keywords and item.nodeid not in explicit:
                item.add_marker(skip)


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Cap host memory across the suite: compiled executables from the
    heavyweight full-model tests otherwise accumulate in one process and
    can abort the interpreter near the end of the run."""
    yield
    jax.clear_caches()
    import gc
    gc.collect()
