"""Multi-device data parallelism tests on the 8-device virtual CPU mesh:
sharded-batch training must match single-device training exactly."""
import numpy as np
import pytest
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


@pytest.mark.proof
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 160, 160, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def _tiny_eval_model(tmp_path, spatial):
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.models import create_model

    opt = dict_to_nonedict({
        'name': 'spatial', 'is_train': False, 'dist': False,
        'model_type': 'RefRestorationModel', 'scale': 4, 'crop_border': 4,
        'val_spatial_shard': spatial, 'manual_seed': 0,
        'network_g': {'type': 'RestorationNet', 'ngf': 8, 'n_blocks': 1,
                      'groups': 8},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'models': str(tmp_path), 'training_state': str(tmp_path)},
    })
    return create_model(opt)


def test_spatial_shard_eval_matches_replicated(tmp_path):
    """val_spatial_shard: batch-1 eval with each image split into
    horizontal bands across the 8 devices must equal the replicated
    (unsharded) eval output — XLA inserts the halo exchanges and
    collectives for the convs, matching, and DCN gathers."""
    rng = np.random.RandomState(0)
    h = 64  # HR bucket size; divisible by the 8-device mesh
    batch = {
        'img_in_lq': rng.rand(1, h // 4, h // 4, 3).astype(np.float32),
        'img_in': rng.rand(1, h, h, 3).astype(np.float32),
        'img_in_up': rng.rand(1, h, h, 3).astype(np.float32),
        'img_ref': rng.rand(1, h, h, 3).astype(np.float32),
    }

    model_r = _tiny_eval_model(tmp_path / 'r', spatial=False)
    model_r.feed_data(dict(batch))
    model_r.test()
    out_r = np.asarray(jax.device_get(model_r.output))

    model_s = _tiny_eval_model(tmp_path / 's', spatial=True)
    # same init weights: copy from the replicated model
    model_s.vars_g = model_r.vars_g
    model_s.vars_extractor = model_r.vars_extractor
    model_s.vars_map = model_r.vars_map
    model_s.feed_data(dict(batch))
    # the spatial path must actually shard on H
    assert any(
        s.data.shape[1] == h // 8
        for s in model_s.batch['img_in'].addressable_shards)
    model_s.test()
    out_s = np.asarray(jax.device_get(model_s.output))

    np.testing.assert_allclose(out_s, out_r, rtol=1e-4, atol=1e-4)


def test_validation_rank_striding_matches_full(monkeypatch, tmp_path):
    """dist_validation's every-world-th striding + sum aggregation must
    reproduce the single-process metrics exactly."""
    from c2matching_tpu.models.sr_model import SRModel

    imgs = [np.full((8, 8, 3), 10 * i + 40, np.uint8) for i in range(5)]
    gts = [np.full((8, 8, 3), 10 * i + 44, np.uint8) for i in range(5)]

    class FakeDS:
        opt = {'name': 'fake'}

    class FakeLoader:
        dataset = FakeDS()

        def __len__(self):
            return len(imgs)

        def __iter__(self):
            return iter([{'lq_path': [f'{i}.png'], 'i': i}
                         for i in range(len(imgs))])

    model = SRModel.__new__(SRModel)
    model.opt = {'crop_border': 0, 'is_train': False}
    model.is_train = False
    model._validation_images = lambda vd: (imgs[vd['i']], gts[vd['i']])

    full = model._validation_loop(FakeLoader(), 0, None, False)

    # simulate 2 ranks: each computes its stride; their local sums are
    # combined by the (single-process identity) reducer — emulate the
    # cross-process sum by accumulating the per-rank raw sums
    import c2matching_tpu.parallel.mesh as mesh_mod
    collected = []

    def fake_reduce(vec):
        collected.append(np.asarray(vec, np.float64))
        return np.sum(collected, axis=0)

    monkeypatch.setattr(mesh_mod, 'allreduce_sum_across_processes',
                        fake_reduce)
    model._validation_loop(FakeLoader(), 0, None, False, rank=0, world=2)
    merged = model._validation_loop(FakeLoader(), 0, None, False,
                                    rank=1, world=2)
    assert merged.keys() == full.keys()
    for k in full:
        np.testing.assert_allclose(merged[k], full[k], rtol=1e-12)
