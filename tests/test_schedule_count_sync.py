"""Iteration-synced LR-schedule counts (base_model.shift_schedule_count).

The reference steps every scheduler in self.schedulers once per training
iteration (base_model.py:155-167) while each torch optimizer only steps
in its own phase — lr_steps milestones are ABSOLUTE iteration numbers.
Our schedule count lives in the optimizer state and advances per UPDATE,
so:

- the D optimizer's schedule count starts at net_g_pretrain_steps (its
  scheduler is the ONLY one stage 3 has upstream — optimizer_g is
  appended after setup_schedulers already ran, so G's LR is constant
  there; see RefRestorationModel.init_training_settings);
- under ``train.schedule_net_g: true`` D-only iterations bump G's
  schedule count by 1 without an Adam update (the lax.cond skip
  branch).

This file pins the helper itself and the update-vs-iteration LR
semantics at the optax level; the full model wiring is pinned
cross-framework by tests/test_composite_train_parity.py's
boundary-crossing trajectory tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from c2matching_tpu.models.base_model import make_adam, shift_schedule_count
from c2matching_tpu.models.lr_scheduler import build_schedule

pytestmark = pytest.mark.fast


def _schedule_counts(opt_state):
    out = []
    for leaf in jax.tree.leaves(
            opt_state,
            is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState)):
        if isinstance(leaf, optax.ScaleByScheduleState):
            out.append(int(leaf.count))
    return out


def test_shift_touches_only_schedule_count():
    params = {'w': jnp.ones((3,))}
    lr_fn = build_schedule({'lr_scheme': 'MultiStepLR', 'lr_steps': [5],
                            'lr_gamma': 0.1})
    tx = make_adam(1e-2, schedule_fn=lr_fn)
    state = tx.init(params)
    assert _schedule_counts(state) == [0]

    shifted = shift_schedule_count(state, 7)
    assert _schedule_counts(shifted) == [7]
    # everything that is not the schedule count is bit-identical
    flat_a = jax.tree.leaves(state)
    flat_b = jax.tree.leaves(shifted)
    assert len(flat_a) == len(flat_b)
    diffs = [i for i, (a, b) in enumerate(zip(flat_a, flat_b))
             if not np.array_equal(np.asarray(a), np.asarray(b))]
    assert len(diffs) == 1  # exactly the count leaf


def test_skipped_iterations_keep_milestones_absolute():
    """An optimizer that only updates on HALF the iterations (D-only
    windows) must still decay at the ABSOLUTE iteration milestone when
    the skipped iterations bump the count, and must decay LATE without
    the bump (the bug the sync fixes)."""
    params = {'w': jnp.zeros((2,))}
    grads = {'w': jnp.ones((2,))}
    lr_fn = build_schedule({'lr_scheme': 'MultiStepLR', 'lr_steps': [4],
                            'lr_gamma': 0.1})
    base_lr = 1.0

    def applied_lr(updates):
        # Adam on constant grads: m_hat/sqrt(v_hat)+eps ~ 1, so the
        # update magnitude IS the lr (up to eps); recover it exactly by
        # ratio against a never-decayed run
        return float(-updates['w'][0])

    # iteration schedule: update on iters 1,3,5,7 (skip 2,4,6)
    def run(bump_on_skip):
        tx = make_adam(base_lr, schedule_fn=lr_fn)
        state = tx.init(params)
        lrs = {}
        for it in range(1, 8):
            if it % 2 == 1:
                updates, state = tx.update(grads, state, params)
                lrs[it] = applied_lr(updates)
            elif bump_on_skip:
                state = shift_schedule_count(state, 1)
        return lrs

    synced = run(bump_on_skip=True)
    # reference semantics: lr at iteration i = lr_fn(i-1); milestone 4
    # decays iterations >= 5
    assert synced[1] == pytest.approx(synced[3], rel=1e-4)
    assert synced[5] == pytest.approx(synced[1] * 0.1, rel=1e-4)
    assert synced[7] == pytest.approx(synced[1] * 0.1, rel=1e-4)

    lagging = run(bump_on_skip=False)
    # without the bump the count reaches 4 only at the 5th UPDATE
    # (iteration 9) — the decay misses the window entirely: stale LR
    assert lagging[5] == pytest.approx(lagging[1], rel=1e-4)
    assert lagging[7] == pytest.approx(lagging[1], rel=1e-4)
