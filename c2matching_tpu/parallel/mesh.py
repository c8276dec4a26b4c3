"""Device mesh and sharding utilities — the framework's parallelism story.

TPU-native replacement for the reference's DP/DDP+NCCL stack
(base_model.py:62-75, train.py:38-45, dist_params YAML block): a single
logical ``jax.sharding.Mesh`` with a 'data' axis over all chips; batches
are sharded on the leading axis with NamedSharding, params are replicated,
and XLA inserts gradient all-reduces over ICI/DCN automatically inside the
jitted train step. ``dist_params`` maps to process/mesh configuration; the
``--launcher`` flag becomes irrelevant (one binary, multi-host by
environment).
"""
import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger('base')


def init_distributed(opt=None):
    """Initialize multi-host JAX if a coordinator is configured.

    The reference's init_dist + NCCL process group (train.py:38-45)
    becomes jax.distributed.initialize(). Configuration comes from the
    environment: JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES and
    JAX_PROCESS_ID when not running under an auto-detected cluster such
    as SLURM/TPU pods, where initialize() infers them). Single-host
    runs skip it entirely."""
    import os
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        num = os.environ.get('JAX_NUM_PROCESSES')
        pid = os.environ.get('JAX_PROCESS_ID')
        jax.distributed.initialize(
            coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
            num_processes=None if num is None else int(num),
            process_id=None if pid is None else int(pid))
        logger.info(
            f'jax.distributed initialized: process {jax.process_index()} / '
            f'{jax.process_count()}')
    return jax.process_index(), jax.process_count()


def get_mesh(devices=None, axis_name='data'):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """NamedSharding placing the leading batch axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


_warned_indivisible = set()


def shard_batch(batch, mesh, axis_name='data', spatial=False):
    """Device-put a host batch dict with the leading axis sharded.

    When the leading axis is not divisible by the mesh size:
    - with ``spatial=True``, 4-D image arrays whose HEIGHT is divisible
      are sharded on axis 1 instead (P(None, 'data')) — batch-1 eval on
      a multi-chip mesh then splits each image into horizontal bands and
      XLA inserts the halo exchanges / gather collectives, instead of
      every chip redundantly computing the whole image;
    - otherwise the array is replicated (redundant compute but correct).
    Non-array entries (paths, flags) pass through untouched."""
    n = mesh.devices.size
    sharded = batch_sharding(mesh, axis_name)
    replicated = replicated_sharding(mesh)
    spatial_sharded = NamedSharding(mesh, P(None, axis_name))

    def put(x):
        if hasattr(x, 'shape') and getattr(x, 'ndim', 0) >= 1:
            if x.shape[0] % n == 0:
                return jax.device_put(x, sharded)
            if spatial and x.ndim == 4 and x.shape[1] % n == 0:
                return jax.device_put(x, spatial_sharded)
            key = (x.shape[0], n)
            if key not in _warned_indivisible:
                _warned_indivisible.add(key)
                logger.warning(
                    f'batch axis {x.shape[0]} not divisible by mesh size '
                    f'{n}; replicating instead of sharding')
            return jax.device_put(x, replicated)
        return x

    return {k: put(v) for k, v in batch.items()}


def allreduce_sum_across_processes(values):
    """Sum a small 1-D float64 numpy vector across all JAX processes
    (metric aggregation for process-sharded validation). Single-process:
    identity. Multi-process: gathers per-process vectors through the
    device mesh (multihost_utils) and sums on the host."""
    values = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        values.astype(np.float32))
    return np.asarray(gathered, np.float64).sum(axis=0)


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def pad_batch_to(batch, batch_size):
    """Pad the leading axis of every array to ``batch_size`` (repeat last
    element) so sharded shapes stay static; returns (batch, n_real)."""
    n_real = None
    out = {}
    for k, v in batch.items():
        if hasattr(v, 'shape') and getattr(v, 'ndim', 0) >= 1:
            n_real = v.shape[0]
            if v.shape[0] < batch_size:
                pad = np.repeat(v[-1:], batch_size - v.shape[0], axis=0)
                v = np.concatenate([v, pad], axis=0)
        out[k] = v
    return out, n_real
