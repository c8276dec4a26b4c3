"""Persistent XLA compilation cache configuration (shared).

Cold compiles of the fused serving/training jits are minutes through
this environment's remote-compile tunnel; a persistent on-disk cache
makes them a one-time cost (bench.py docstring has the measurements).
One helper so bench.py / scripts/serve.py / scripts/profile_serving.py
/ tests agree on the location and thresholds.
"""
import os.path as osp

_REPO = osp.abspath(osp.join(osp.dirname(__file__), *['..'] * 2))


def enable_persistent_cache(min_compile_secs=1.0, cache_dir=None):
    """Point jax at the in-repo .xla_cache (gitignored). Call after
    importing jax, before the first jit executes."""
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      cache_dir or osp.join(_REPO, '.xla_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_secs))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
