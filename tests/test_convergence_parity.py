"""Toy-scale convergence parity (VERDICT r4 item 2) — the closest
executable analog of the 0.05 dB CUFED5 quality gate while real
weights/data remain unavailable.

Where test_composite_train_parity pins 2-13 iterations step-by-step,
these tests train for HUNDREDS of iterations in BOTH frameworks on the
same synthetic data (the reference's torch stack runs verbatim through
the gradcheck-verified differentiable ``_ext`` stub) and compare the
VALIDATION-METRIC TRAJECTORY at matched checkpoints — not bitwise, but
within tolerances that a wiring bug (wrong LR, loss scale, schedule,
gating) would blow through immediately, while benign f32 reassociation
noise stays inside them:

- stage 3 MSE (G-pretrain path, ref_restoration_model.py:199-207):
  120 L1 iterations at 64px, val PSNR on held-out batches at
  iterations 30/60/90/120;
- stage 1 teacher (teacher_contras_model.py:212-227): 200 triplet
  iterations at 128px crossing an lr_steps=[120] milestone, val
  triplet loss / pos / neg distances at 50/100/150/200.

Opt-in (``-m convergence``): measured cost on this 1-core host
(2026-08-20, after the ResBlockStack auto-unroll fix — the first run
took 2.6 h because XLA:CPU runs the scanned trunk conv-backward ~60x
slower than unrolled): stage-3 ~35 min (jax side 4.5 s/iter), stage-1
~6 min. Trajectories are pinned in PARITY.md whenever this runs.
"""
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

from reference_stack import load_reference_models, restore_modules  # noqa: E402
from test_composite_train_parity import (_build_jax_stage3,  # noqa: E402
                                         _build_torch_stage3,
                                         _contras_batches,
                                         _contras_to_torch,
                                         _contras_train_opt,
                                         _sd_to_pth, _stage3_batches,
                                         _to_torch)

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))

pytestmark = pytest.mark.convergence


def _dump_trajectories(name, traj_t, traj_j):
    """Persist the measured trajectories (pinned in PARITY.md) — pytest
    swallows passed-test stdout, so an artifact file keeps the numbers
    retrievable after a green run."""
    import json
    path = osp.join(REPO, '.convergence_trajectories.json')
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    data[name] = {str(i): {'torch': traj_t[i], 'jax': traj_j[i]}
                  for i in sorted(traj_t)}
    with open(path, 'w') as f:
        json.dump(data, f, indent=1, sort_keys=True)


@pytest.fixture(scope='module')
def ref_models():
    models, archs, saved = load_reference_models()
    yield models
    restore_modules(saved)


@pytest.fixture()
def one_device_mesh(monkeypatch):
    from c2matching_tpu.models import base_model as bm
    from c2matching_tpu.parallel.mesh import get_mesh
    monkeypatch.setattr(bm, 'get_mesh',
                        lambda: get_mesh(jax.devices()[:1]))


def _psnr(out, gt):
    out = np.clip(np.asarray(out, np.float64), 0., 1.)
    mse = float(np.mean((out - np.asarray(gt, np.float64)) ** 2))
    return -10. * np.log10(max(mse, 1e-12))


def test_stage3_mse_convergence(ref_models, tmp_path, monkeypatch,
                                one_device_mesh):
    """120 G-pretrain (L1) iterations both ways on a cycled 8-batch
    pool; val PSNR trajectories on 2 held-out batches must rise and
    agree at every checkpoint."""
    n_iters, pool_n = 120, 8
    checkpoints = (30, 60, 90, 120)

    ref, paths = _build_torch_stage3(ref_models, pretrain_steps=10 ** 9,
                                     tmp_path=tmp_path)
    model = _build_jax_stage3(paths, pretrain_steps=10 ** 9,
                              tmp_path=tmp_path, monkeypatch=monkeypatch)
    pool = _stage3_batches(pool_n, seed=31)
    val = _stage3_batches(2, seed=97)

    def val_psnr_torch():
        vals = []
        with torch.no_grad():
            for vb in val:
                ref.feed_data(_to_torch(vb))
                ref.test()
                out = ref.output.detach().numpy().transpose(0, 2, 3, 1)
                vals.append(_psnr(out, vb['img_in']))
        return float(np.mean(vals))

    def val_psnr_jax():
        vals = []
        for vb in val:
            model.feed_data(vb)
            model.test()
            vals.append(_psnr(jax.device_get(model.output), vb['img_in']))
        return float(np.mean(vals))

    traj_t, traj_j = {0: val_psnr_torch()}, {0: val_psnr_jax()}
    # identical random inits loaded from the same .pth on both sides
    assert abs(traj_t[0] - traj_j[0]) < 0.05, (traj_t[0], traj_j[0])

    for i in range(1, n_iters + 1):
        ref.feed_data(_to_torch(pool[(i - 1) % pool_n]))
        ref.optimize_parameters(i)
        if i in checkpoints:
            traj_t[i] = val_psnr_torch()
    for i in range(1, n_iters + 1):
        model.feed_data(pool[(i - 1) % pool_n])
        model.optimize_parameters(i)
        if i in checkpoints:
            traj_j[i] = val_psnr_jax()

    print('\nstage3-MSE val PSNR trajectory (torch vs jax):')
    for i in sorted(traj_t):
        print(f'  iter {i:4d}: {traj_t[i]:.4f} vs {traj_j[i]:.4f} dB '
              f'(delta {traj_j[i] - traj_t[i]:+.4f})')
    _dump_trajectories('stage3_mse_psnr', traj_t, traj_j)

    # both frameworks actually LEARN on this data (measured 2026-08-20:
    # torch +0.635 dB, jax +0.738 dB over the 120 iters — the smooth
    # synthetic pool saturates slowly; +0.4 keeps ~60% margin while a
    # dead optimizer or zeroed loss still fails immediately)...
    assert traj_t[n_iters] > traj_t[0] + 0.4, traj_t
    assert traj_j[n_iters] > traj_j[0] + 0.4, traj_j
    # ...and the trajectories agree at every checkpoint (a wrong LR /
    # loss scale separates the curves by several dB within 30 iters)
    for i in checkpoints:
        assert abs(traj_t[i] - traj_j[i]) <= 0.30, (
            i, traj_t[i], traj_j[i])


def test_stage1_teacher_convergence(ref_models, tmp_path, monkeypatch,
                                    one_device_mesh):
    """200 teacher triplet iterations both ways (cycled 12-batch pool at
    128px, lr_steps=[120] milestone crossed mid-run); val triplet-loss
    trajectories on 4 held-out batches must fall and agree at every
    checkpoint."""
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse

    n_iters, pool_n, gt = 200, 12, 128
    checkpoints = (50, 100, 150, 200)
    sched = {'lr_steps': [120], 'lr_gamma': 0.1}

    torch.manual_seed(14)
    opt_t = {'is_train': True, 'dist': False, 'gpu_ids': None,
             'network_g': {'type': 'ContrasExtractorSep'},
             'path': {'strict_load': True},
             'train': dict(_contras_train_opt(), **sched)}
    ref = ref_models['teacher'].TeacherContrasModel(opt_t)
    g_pth = _sd_to_pth(ref.net_g, tmp_path / 'net_g.pth')

    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = parse(osp.join(REPO, 'options', 'train',
                         'debug_stage1_synth.yml'), is_train=True)
    opt['name'] = 'convergence_stage1'
    opt['path']['pretrain_model_g'] = g_pth
    opt['train'].update(sched)
    model = create_model(dict_to_nonedict(opt))

    pool = _contras_batches(pool_n, with_up=False, seed=41, gt=gt)
    val = _contras_batches(4, with_up=False, seed=83, gt=gt)

    def val_loss_torch():
        vals = []
        with torch.no_grad():
            for vb in val:
                ref.feed_data(_contras_to_torch(vb))
                ref.test()
                loss, pos, neg = ref.loss_function()
                vals.append(float(loss))
        return float(np.mean(vals))

    def val_loss_jax():
        vals = []
        for vb in val:
            model.feed_data(vb)
            model.test()
            vals.append(float(model._last_eval['loss']))
        return float(np.mean(vals))

    traj_t, traj_j = {0: val_loss_torch()}, {0: val_loss_jax()}
    assert abs(traj_t[0] - traj_j[0]) <= 0.01 * max(abs(traj_t[0]), 1e-6)

    for i in range(1, n_iters + 1):
        ref.update_learning_rate(i, warmup_iter=-1)
        ref.feed_data(_contras_to_torch(pool[(i - 1) % pool_n]))
        ref.optimize_parameters(i)
        if i in checkpoints:
            traj_t[i] = val_loss_torch()
    for i in range(1, n_iters + 1):
        model.feed_data(pool[(i - 1) % pool_n])
        model.optimize_parameters(i)
        if i in checkpoints:
            traj_j[i] = val_loss_jax()

    print('\nstage1 val triplet-loss trajectory (torch vs jax):')
    for i in sorted(traj_t):
        print(f'  iter {i:4d}: {traj_t[i]:.5f} vs {traj_j[i]:.5f} '
              f'(rel delta {(traj_j[i] - traj_t[i]) / traj_t[i]:+.3%})')
    _dump_trajectories('stage1_triplet_loss', traj_t, traj_j)

    # learning happened...
    assert traj_t[n_iters] < 0.9 * traj_t[0], traj_t
    assert traj_j[n_iters] < 0.9 * traj_j[0], traj_j
    # ...on agreeing trajectories (relative tolerance: triplet loss is
    # O(1)-scaled; a wrong LR or a missed milestone separates curves by
    # tens of percent inside 50 iterations)
    for i in checkpoints:
        assert abs(traj_t[i] - traj_j[i]) <= 0.10 * abs(traj_t[i]), (
            i, traj_t[i], traj_j[i])
