"""Batch-sharded SERVING equivalence on the 8-device virtual CPU mesh.

The bench/serving dataflow is one fused jit over the full pipeline
(contrastive extraction -> dense matching -> VGG19 ref features ->
correspondence-seeded restoration; reference call stack SURVEY.md §3.1,
mmsr/test.py:13 -> ref_restoration_model.py:271). Multi-chip serving
shards the batch over a 1-D data mesh and lets XLA partition everything
— including the matcher vmap and the per-image DCN gather scan — with
no collectives on the forward path. This test pins that property: an
8-way batch-sharded run must equal the single-device run.
"""
import numpy as np
import jax
import jax.numpy as jnp

from c2matching_tpu.models.archs import (ContrasExtractorSep,
                                         CorrespondenceGenerationArch,
                                         RestorationNet)
from c2matching_tpu.parallel import get_mesh, replicate, shard_batch


def test_batch_sharded_serving_matches_single_device():
    gt = 32                      # tiny static bucket; structure as serving
    lr = gt // 4
    batch = 8
    rng = jax.random.PRNGKey(0)

    ext = ContrasExtractorSep()
    cg = CorrespondenceGenerationArch()
    net = RestorationNet()

    up0 = jnp.zeros((1, gt, gt, 3))
    lr0 = jnp.zeros((1, lr, lr, 3))
    ext_params = ext.init(rng, up0, up0)
    feats0 = ext.apply(ext_params, up0, up0)
    cg_params = cg.init(rng, feats0, up0)
    po0, rf0 = cg.apply(cg_params, feats0, up0)
    g_params = net.init(rng, lr0, po0, rf0)

    @jax.jit
    def full(ep, cp, gp, up, ref, lqr):
        po, rf = cg.apply(cp, ext.apply(ep, up, ref), ref)
        return net.apply(gp, lqr, po, rf)

    up = jax.random.uniform(jax.random.PRNGKey(1), (batch, gt, gt, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (batch, gt, gt, 3))
    lqr = jax.random.uniform(jax.random.PRNGKey(3), (batch, lr, lr, 3))

    out1 = np.asarray(full(ext_params, cg_params, g_params, up, ref, lqr))

    mesh = get_mesh()
    assert mesh.devices.size == 8
    ep, cp, gp = (replicate(p, mesh)
                  for p in (ext_params, cg_params, g_params))
    sb = shard_batch({'up': np.asarray(up), 'ref': np.asarray(ref),
                      'lqr': np.asarray(lqr)}, mesh)
    # must actually shard the batch axis, one image per device
    assert all(s.data.shape[0] == 1
               for s in sb['up'].addressable_shards)

    out8 = np.asarray(full(ep, cp, gp, sb['up'], sb['ref'], sb['lqr']))

    assert out8.shape == (batch, gt, gt, 3)
    np.testing.assert_allclose(out8, out1, rtol=1e-5, atol=1e-5)
