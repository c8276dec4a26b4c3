"""Child process for the 2-process jax.distributed test (see
test_multihost.py). Env contract: JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID set by the parent;
XLA_FLAGS forces 2 virtual CPU devices per process."""

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

from c2matching_tpu.parallel.mesh import (  # noqa: E402
    allreduce_sum_across_processes, get_mesh, init_distributed)


def main():
    rank, world = init_distributed()
    assert world == 2, f'expected 2 processes, got {world}'
    assert len(jax.devices()) == 4, 'expected 4 global devices'
    assert len(jax.local_devices()) == 2

    # 1. cross-process metric aggregation (dist_validation's reducer)
    local = np.asarray([1.0 + rank, 10.0 * (rank + 1), 3.0])
    total = allreduce_sum_across_processes(local)
    np.testing.assert_allclose(total, [3.0, 30.0, 6.0])

    # 2. one jitted computation over the global mesh: per-process shards
    # assembled into a global array, reduced with a cross-process
    # collective inside jit
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh()
    sharding = NamedSharding(mesh, P('data'))
    local_data = np.arange(8, dtype=np.float32) + 8 * rank  # (8,) each
    garr = jax.make_array_from_process_local_data(sharding, local_data)
    assert garr.shape == (16,)
    got = float(jax.jit(jnp.sum)(garr))
    assert got == float(np.arange(16).sum()), got

    # 3. one sharded DP train-style step: replicated params, global
    # batch sharded on 'data', grads all-reduced by XLA
    repl = NamedSharding(mesh, P())
    w = jax.device_put(jnp.ones((4,)), repl)
    xs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('data', None)),
        np.full((8, 4), 1.0 + rank, np.float32))

    @jax.jit
    def loss_grad(w, xs):
        return jax.grad(lambda w: jnp.mean(xs @ w))(w)

    # d/dw_j mean_i (xs @ w)_i = mean_i xs_ij = (8*1 + 8*2)/16 = 1.5
    g = jax.device_get(loss_grad(w, xs))
    np.testing.assert_allclose(np.asarray(g), np.full((4,), 1.5),
                               rtol=1e-6)

    print(f'MULTIHOST_OK rank={rank}', flush=True)


if __name__ == '__main__':
    main()
