"""Traced-do_g fused GAN step (net_d_steps>1 / net_d_init_steps>0).

Configs with D-only iterations used to compile TWO full fused
executables (do_g static). They now compile ONE, with the G phase under
``lax.cond``. This pins:

- numerical equivalence vs the static-do_g variant over a mixed
  schedule of D-only and D+G iterations (losses per step, final params),
- that both iteration kinds run through a single compiled executable,
- reference logging parity: D-only iterations carry no G-loss keys
  (reference ref_restoration_model.py:241-269 only populates them in
  the G branch).
"""
import numpy as np
import pytest


def _small_opt(tmp_path, seed=0):
    from c2matching_tpu.utils import dict_to_nonedict

    return dict_to_nonedict({
        'name': 'dyn_dg', 'is_train': True,
        'model_type': 'RefRestorationModel', 'scale': 4, 'crop_border': 4,
        'manual_seed': seed,
        'network_g': {'type': 'RestorationNet', 'ngf': 8, 'n_blocks': 1,
                      'groups': 8},
        'network_d': {'type': 'ImageDiscriminator', 'in_nc': 3, 'ndf': 2},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'models': str(tmp_path), 'training_state': str(tmp_path)},
        'train': {'lr_g': 1e-4, 'lr_d': 1e-4, 'lr_scheme': 'MultiStepLR',
                  'niter': 10, 'lr_steps': [], 'lr_gamma': 0.1,
                  'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
                  'gan_type': 'wgan', 'gan_weight': 1e-6,
                  'grad_penalty_weight': 10.0,
                  'net_g_pretrain_steps': 0, 'net_d_steps': 2,
                  'net_d_init_steps': 1},
    })


def _mk_batch(seed, b=2, gt=64):
    r = np.random.RandomState(seed)
    return {
        'img_in_up': r.rand(b, gt, gt, 3).astype(np.float32),
        'img_in': r.rand(b, gt, gt, 3).astype(np.float32),
        'img_ref': r.rand(b, gt, gt, 3).astype(np.float32),
        'img_in_lq': r.rand(b, gt // 4, gt // 4, 3).astype(np.float32),
    }


@pytest.mark.proof
def test_dynamic_do_g_matches_static(tmp_path):
    import jax
    from c2matching_tpu.models import create_model

    batches = [_mk_batch(100 + i) for i in range(4)]
    # do_g per step (pretrain=0, d_steps=2, d_init=1): F, T, F, T
    expected_do_g = [False, True, False, True]

    # model A: D-only iterations exist -> traced do_g (lax.cond)
    model_a = create_model(_small_opt(tmp_path / 'a'))
    assert model_a._dynamic_do_g
    assert hasattr(model_a._gan_step, '_inner_jit')

    # model B: same config, but the step built the static-do_g way
    # (counters temporarily swapped to the no-D-only values at build
    # time, then restored so optimize_parameters gates identically)
    model_b = create_model(_small_opt(tmp_path / 'b'))
    model_b.net_d_steps, model_b.net_d_init_steps = 1, 0
    model_b._gan_step = model_b._build_gan_step()
    assert not model_b._dynamic_do_g
    model_b.net_d_steps, model_b.net_d_init_steps = 2, 1
    model_b._dynamic_do_g = False

    logs_a, logs_b = [], []
    for i, batch in enumerate(batches):
        for model, logs in ((model_a, logs_a), (model_b, logs_b)):
            model.feed_data(dict(batch))
            model.optimize_parameters(i + 1)
            logs.append({k: float(v) for k, v in model.log_dict.items()})

    for i, (la, lb) in enumerate(zip(logs_a, logs_b)):
        assert set(la) == set(lb), (i, set(la) ^ set(lb))
        # reference logging parity: G keys only on G iterations
        assert ('l_g_pix' in la) == expected_do_g[i], (i, sorted(la))
        for k in la:
            np.testing.assert_allclose(la[k], lb[k], rtol=2e-5,
                                       atol=1e-6, err_msg=f'step {i} {k}')

    for pa, pb in zip(jax.tree.leaves(model_a.vars_g['params']),
                      jax.tree.leaves(model_b.vars_g['params'])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=2e-5, atol=1e-6)
    # D params: the cond-wrapped step fuses differently from the static
    # one, so f32 reduction-order flips of near-zero grads get amplified
    # by Adam's ~sign(g) update into param deltas bounded by
    # O(steps*lr) = 4 * 1e-4 (same mechanism as
    # tests/test_parallel_production.py — the per-step LOSSES above at
    # rtol=2e-5 are the sharp signal; observed max abs diff 4e-5 on the
    # wgan grad-penalty path). Absolute bound: rel tol is meaningless
    # for near-zero weights under a ~sign(g) optimizer.
    for pa, pb in zip(jax.tree.leaves(model_a.vars_d),
                      jax.tree.leaves(model_b.vars_d)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=0, atol=4e-4)

    # ONE executable served both the D-only and the D+G iterations
    assert model_a._gan_step._inner_jit._cache_size() == 1
