"""Multi-device data parallelism tests on the 8-device virtual CPU mesh:
sharded-batch training must match single-device training exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from c2matching_tpu.parallel import (get_mesh, replicate, shard_batch)


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_sharded_training_step_matches_single_device():
    """A jitted SGD step on a sharded batch must produce the same params
    as the unsharded computation (XLA inserts the gradient all-reduce)."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=1)(x)
            x = nn.relu(x)
            return nn.Conv(3, (3, 3), padding=1)(x)

    model = Tiny()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (8, 16, 16, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    params = model.init(rng, x)
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        return jnp.mean((model.apply(params, x) - y) ** 2)

    @jax.jit
    def step(params, opt_state, x, y):
        g = jax.grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    # single-device result
    p1, _ = step(params, opt_state, x, y)

    # sharded result
    mesh = get_mesh()
    params_r = replicate(params, mesh)
    opt_r = replicate(opt_state, mesh)
    batch = shard_batch({'x': np.asarray(x), 'y': np.asarray(y)}, mesh)
    p2, _ = step(params_r, opt_r, batch['x'], batch['y'])

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-6)


def test_shard_batch_partitions_leading_axis():
    mesh = get_mesh()
    batch = shard_batch({'x': np.zeros((16, 4, 4, 3)),
                         'meta': ['a', 'b']}, mesh)
    shard_shapes = [s.data.shape for s in batch['x'].addressable_shards]
    assert all(s == (2, 4, 4, 3) for s in shard_shapes)
    assert batch['meta'] == ['a', 'b']


def test_shard_batch_replicates_indivisible():
    mesh = get_mesh()
    batch = shard_batch({'x': np.zeros((3, 4))}, mesh)
    shard_shapes = [s.data.shape for s in batch['x'].addressable_shards]
    assert all(s == (3, 4) for s in shard_shapes)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 160, 160, 3)
    assert np.all(np.isfinite(np.asarray(out)))
