"""Persistent XLA compilation cache configuration (shared).

Cold compiles of the fused serving/training jits are minutes through
this environment's remote-compile tunnel; a persistent on-disk cache
makes them a one-time cost (bench.py docstring has the measurements).
One helper so bench.py / scripts/serve.py / scripts/profile_serving.py
/ tests agree on the location and thresholds.
"""
import hashlib
import os.path as osp
import platform

_REPO = osp.abspath(osp.join(osp.dirname(__file__), *['..'] * 2))


def _host_fingerprint():
    """Short hash of the host CPU's ISA surface.

    XLA's persistent-cache key does NOT include the host machine
    features that XLA:CPU AOT-compiles against, so a cache directory
    shared across heterogeneous hosts serves executables compiled for
    another machine's vector extensions (loader warns 'could lead to
    execution errors such as SIGILL' — observed live when a container
    moved hosts). Scoping the directory per ISA fingerprint keeps
    same-host reuse and makes cross-host entries invisible. TPU entries
    are remote-compiled device code, but they share the directory, so
    they scope too — a one-time rewarm after a host move.
    """
    feats = platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    feats += ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_persistent_cache(min_compile_secs=1.0, cache_dir=None):
    """Point jax at the in-repo .xla_cache (gitignored), scoped by host
    ISA fingerprint (see _host_fingerprint). Call after importing jax,
    before the first jit executes."""
    import jax
    jax.config.update(
        'jax_compilation_cache_dir',
        cache_dir or osp.join(_REPO, '.xla_cache', _host_fingerprint()))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_secs))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
