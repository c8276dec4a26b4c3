"""Shared fetch-forced timing protocol for the profilers.

On the tunnelled TPU backend, ``block_until_ready`` does NOT force
execution — any timing must fetch a scalar per iteration (see
.claude/skills/verify/SKILL.md). The checksum here is a single JITTED
fused reduction over the output pytree, so every timed phase pays
exactly ONE extra executable dispatch + one scalar fetch regardless of
how many leaves its output has. (A per-leaf eager ``jnp.sum`` loop —
the previous protocol — dispatched hundreds of tiny tunnel kernels for
param/opt-state-sized outputs, inflating those phases relative to the
single-leaf fetch calibration.)

One module so scripts/profile_serving.py and scripts/profile_train.py
cannot diverge.
"""
import time


def _checksum_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fused(out):
        leaves = [jnp.sum(jnp.asarray(leaf, jnp.float32))
                  for leaf in jax.tree.leaves(out)
                  if hasattr(leaf, 'dtype')]
        return sum(leaves) if leaves else jnp.float32(0)

    return fused


def timed(fn, inputs, iters):
    """Mean seconds per call of ``fn`` over ``iters`` distinct inputs;
    one fused-checksum fetch per iteration forces execution. The last
    element of ``inputs`` is the compile/warm call (not timed)."""
    fused = _checksum_fn()

    def fetch(out):
        return float(fused(out))

    fetch(fn(*inputs[-1]))  # compile + warm fn AND the checksum
    t0 = time.time()
    for i in range(iters):
        fetch(fn(*inputs[i]))
    return (time.time() - t0) / iters


def calibrate_fetch(iters):
    """Per-iteration overhead of the protocol itself: one trivial
    executable dispatch + the fused-checksum dispatch + scalar fetch —
    structurally identical to what every timed phase pays on top of its
    real work. Subtract from timed() results for net phase times."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    return timed(tiny, [(jnp.float32(i),) for i in range(iters + 1)],
                 iters)
