"""Learning-rate schedules.

Parity target: mmsr/models/lr_scheduler.py (MultiStepRestartLR :7-47,
CosineAnnealingRestartLR :50-107) plus the linear warmup applied on top
by BaseModel.update_learning_rate (base_model.py:155-177).

Expressed as pure ``lr_fn(step, base_lr) -> lr`` functions (the
reference schedulers are stateful and multiplicative per group; the
pure form evaluates the same closed form for any group's base LR, which
matters for CosineAnnealingRestartLR whose ``eta_min`` floor is an
ABSOLUTE learning rate applied per group, not a fraction of lr_g).
All branching is jnp-based so the schedules trace cleanly inside jitted
optimizer updates (and still evaluate on concrete host ints).
"""
import math

import jax.numpy as jnp


def multi_step_restart_schedule(milestones, gamma=0.1, restarts=(0,),
                                restart_weights=(1,)):
    """Step decay with optional warm restarts (MultiStepRestartLR :7-47).

    Returns lr_fn(step, base_lr). At each milestone the LR is scaled by
    gamma (cumulatively, duplicates compound); a restart at iteration r
    resets the LR to base_lr * weight and wipes earlier decays. Before
    the first configured restart the weight is 1 and ALL earlier
    milestones apply (the reference only touches the LR when
    ``last_epoch in restarts`` — a first restart at r > 0 changes
    nothing for steps < r).
    """
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = [float(w) for w in restart_weights]
    assert len(restarts) == len(restart_weights), \
        'restarts and their weights do not match.'
    if not restarts or restarts[0] != 0:
        # implicit segment before the first restart: weight 1, counting
        # from step 0
        restarts = [0] + restarts
        restart_weights = [1.0] + restart_weights

    def lr_fn(step, base_lr):
        step = jnp.asarray(step)
        # active restart segment = last restart <= step
        seg = jnp.maximum(
            sum((step >= r).astype(jnp.int32) for r in restarts) - 1, 0)
        weight = jnp.take(jnp.asarray(restart_weights), seg)
        # per-segment decay count: milestones strictly after that
        # segment's start (a restart wipes earlier decays; a milestone
        # colliding with a restart iteration is skipped, as the
        # reference's restart branch returns before the milestone one)
        decays = []
        for seg_start in restarts:
            local = [m for m in milestones if m > seg_start]
            decays.append(sum((step >= m).astype(jnp.int32)
                              for m in local) if local else
                          jnp.zeros((), jnp.int32))
        n_decays = jnp.take(jnp.stack([jnp.asarray(d) for d in decays]),
                            seg)
        return base_lr * weight * (gamma ** n_decays.astype(jnp.float32))

    return lr_fn


def cosine_annealing_restart_schedule(period, restarts=(),
                                      restart_weights=(), eta_min=0.0):
    """Cosine annealing with restarts (CosineAnnealingRestartLR :50-107),
    reference schema: ``period`` has one more element than ``restarts``
    (absolute restart iterations, ascending); segment i runs from
    restart i-1 (or 0) with period[i] and weight restart_weights[i-1]
    (1 before the first restart). ``eta_min`` is an ABSOLUTE minimum LR
    applied per group.

        lr = eta_min + w * 0.5 * (base_lr - eta_min)
                     * (1 + cos(pi * (step - nearest_restart) / period))

    Faithfully NOT clipped at the period end: past it the cosine rises
    again, exactly as the reference's closed form does.
    """
    period = list(period)
    restarts = list(restarts)
    restart_weights = [float(w) for w in restart_weights]
    assert len(restarts) == len(restart_weights), \
        'restarts and their weights do not match.'
    assert len(period) - len(restarts) == 1, \
        'period should have one more element then restarts.'
    starts = [0] + restarts
    weights = [1.0] + restart_weights

    def lr_fn(step, base_lr):
        step = jnp.asarray(step)
        seg = sum((step >= r).astype(jnp.int32) for r in restarts) \
            if restarts else jnp.zeros((), jnp.int32)
        start = jnp.take(jnp.asarray(starts), seg)
        t_per = jnp.take(jnp.asarray([float(p) for p in period]), seg)
        weight = jnp.take(jnp.asarray(weights), seg)
        t = (step - start).astype(jnp.float32)
        return (eta_min + weight * 0.5 * (base_lr - eta_min)
                * (1 + jnp.cos(math.pi * t / t_per)))

    return lr_fn


def with_warmup(lr_fn, warmup_iter=-1):
    """Linear LR warmup over the first ``warmup_iter`` steps
    (base_model.py:155-177); -1 disables.

    Reference semantics: while current_iter < warmup_iter the LR is
    ``initial_lr * current_iter / warmup_iter`` — the warmup REPLACES
    the scheduler's value (update_learning_rate steps the scheduler,
    then overwrites every group with the linear ramp of the INITIAL
    lr, base_model.py:167-177), it does not scale it. The ramp here is
    exactly that. ``step`` is 0-indexed (= current_iter - 1).

    DELIBERATE deviation after the window: the reference's MultiStep
    scheduler is MULTIPLICATIVE on the live group lr, so its warmup
    overwrite permanently clobbers any decay whose milestone fell
    inside the window and freezes the LR at the last ramp value until
    the next restart (verified against the upstream classes in
    tests/test_lr_scheduler.py). That is an upstream bug no shipped
    config exercises (every reference YAML sets warmup_iter: -1);
    here the closed-form schedule simply takes over once the ramp
    ends, which is the intended warmup semantics."""
    if warmup_iter is None or warmup_iter <= 0:
        return lr_fn

    def warmed(step, base_lr):
        step = jnp.asarray(step)
        ramp = base_lr * (step.astype(jnp.float32) + 1) / warmup_iter
        return jnp.where(step + 1 < warmup_iter, ramp,
                         lr_fn(step, base_lr))

    return warmed


def build_schedule(train_opt):
    """Build lr_fn(step, base_lr) from the YAML ``train`` block
    (base_model.py:77-108 dispatch on lr_scheme)."""
    scheme = train_opt.get('lr_scheme', 'MultiStepLR') or 'MultiStepLR'
    if scheme in ('MultiStepLR', 'MultiStepRestartLR'):
        sched = multi_step_restart_schedule(
            train_opt.get('lr_steps') or [],
            gamma=train_opt.get('lr_gamma', 0.1) or 0.1,
            restarts=train_opt.get('restarts') or [0],
            restart_weights=train_opt.get('restart_weights') or [1])
    elif scheme == 'CosineAnnealingRestartLR':
        sched = cosine_annealing_restart_schedule(
            train_opt['period'],
            restarts=train_opt.get('restarts') or [],
            restart_weights=train_opt.get('restart_weights') or [],
            eta_min=float(train_opt.get('eta_min', 0) or 0))
    else:
        raise NotImplementedError(f'lr_scheme {scheme} is not implemented.')
    return with_warmup(sched, train_opt.get('warmup_iter', -1))
