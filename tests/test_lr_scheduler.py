"""LR schedules pinned against the REFERENCE'S OWN scheduler classes
(mmsr/models/lr_scheduler.py, loaded verbatim and stepped through a
torch optimizer) — including the cases the pure closed form gets wrong
if restarts/eta_min are mishandled: a first restart later than 0, and
CosineAnnealingRestartLR's ABSOLUTE eta_min floor per param group.
"""
import importlib.util

import numpy as np
import pytest
import torch

from c2matching_tpu.models.lr_scheduler import (
    cosine_annealing_restart_schedule, multi_step_restart_schedule,
    with_warmup)

pytestmark = pytest.mark.fast


def _ref_module():
    spec = importlib.util.spec_from_file_location(
        'ref_lr_scheduler', '/root/reference/mmsr/models/lr_scheduler.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_lr_sequence(make_scheduler, base_lrs, n_steps):
    params = [torch.nn.Parameter(torch.zeros(1)) for _ in base_lrs]
    opt = torch.optim.SGD([{'params': [p], 'lr': lr}
                           for p, lr in zip(params, base_lrs)])
    sched = make_scheduler(opt)
    seq = [[g['lr'] for g in opt.param_groups]]
    for _ in range(n_steps - 1):
        sched.step()
        seq.append([g['lr'] for g in opt.param_groups])
    return np.asarray(seq)  # (n_steps, n_groups); row t = lr at epoch t


@pytest.mark.parametrize('milestones,gamma,restarts,weights', [
    ([3, 6, 6], 0.5, [0], [1]),
    ([5, 12], 0.1, [10], [0.5]),        # first restart AFTER milestones
    ([5, 15, 25], 0.1, [10, 20], [0.5, 0.25]),
])
def test_multi_step_restart_matches_reference(milestones, gamma, restarts,
                                              weights):
    ref = _ref_module()
    base = 1e-3
    want = _ref_lr_sequence(
        lambda opt: ref.MultiStepRestartLR(opt, milestones, gamma=gamma,
                                           restarts=restarts,
                                           restart_weights=weights),
        [base], 30)[:, 0]
    lr_fn = multi_step_restart_schedule(milestones, gamma=gamma,
                                        restarts=restarts,
                                        restart_weights=weights)
    got = np.asarray([float(lr_fn(t, base)) for t in range(30)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cosine_restart_matches_reference_per_group():
    """Two param groups with different base LRs: the eta_min floor is
    absolute per group (reference get_lr uses base_lr - eta_min), so a
    multiplier derived from lr_g alone would mis-scale group 2."""
    ref = _ref_module()
    period = [10, 10, 10, 10]
    restarts = [10, 20, 30]
    weights = [1, 0.5, 0.5]
    eta_min = 1e-7
    base_lrs = [1e-4, 4e-4]
    want = _ref_lr_sequence(
        lambda opt: ref.CosineAnnealingRestartLR(
            opt, period, restarts=restarts, restart_weights=weights,
            eta_min=eta_min),
        base_lrs, 40)
    lr_fn = cosine_annealing_restart_schedule(
        period, restarts=restarts, restart_weights=weights,
        eta_min=eta_min)
    for g, base in enumerate(base_lrs):
        got = np.asarray([float(lr_fn(t, base)) for t in range(40)])
        np.testing.assert_allclose(got, want[:, g], rtol=1e-6,
                                   err_msg=f'group {g}')


def test_warmup_replaces_scheduler_like_reference():
    """Warmup REPLACES the scheduled LR with init_lr*iter/warmup_iter
    (base_model.py:163-177) — it does not scale the scheduler's value.
    Pinned with a milestone INSIDE the warmup window, where scaling and
    replacing disagree by a factor of gamma.

    The reference's own warmup is verified here to be PATHOLOGICAL past
    the window: its MultiStep scheduler is multiplicative on the live
    group lr, so the overwrite permanently clobbers the milestone decay
    and the LR freezes at the last ramp value (no shipped config uses
    warmup). The closed form matches the reference exactly DURING the
    ramp and deliberately applies the intended schedule after it — see
    with_warmup's docstring."""
    ref = _ref_module()
    base = 1e-3
    milestones, gamma, warmup = [4], 0.1, 8
    params = [torch.nn.Parameter(torch.zeros(1))]
    opt = torch.optim.SGD([{'params': params, 'lr': base}])
    sched = ref.MultiStepRestartLR(opt, milestones, gamma=gamma)
    init_lrs = [g['initial_lr'] for g in opt.param_groups]

    # transliteration of BaseModel.update_learning_rate(current_iter,
    # warmup_iter): step the scheduler from iter 2 on, then overwrite
    # with the linear ramp of the INITIAL lr while current_iter < warmup
    want = []
    for current_iter in range(1, 15):
        if current_iter > 1:
            sched.step()
        if current_iter < warmup:
            for g, ilr in zip(opt.param_groups, init_lrs):
                g['lr'] = ilr / warmup * current_iter
        want.append(opt.param_groups[0]['lr'])

    lr_fn = with_warmup(
        multi_step_restart_schedule(milestones, gamma=gamma),
        warmup_iter=warmup)
    got = [float(lr_fn(current_iter - 1, base))
           for current_iter in range(1, 15)]

    # iters 1..7 (the ramp): exact reference parity — warmup replaces,
    # never scales (a scaling warmup would be 10x lower from iter 4 on)
    np.testing.assert_allclose(got[:7], want[:7], rtol=1e-6)
    # upstream pathology documented: the reference stays frozen at the
    # last ramp value after the window (milestone decay clobbered)
    np.testing.assert_allclose(want[7:], base * 7 / 8, rtol=1e-6)
    # our deliberate deviation: the schedule takes over post-ramp
    np.testing.assert_allclose(got[7:], base * gamma, rtol=1e-6)
