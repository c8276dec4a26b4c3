"""Learning-rate schedules.

Parity target: mmsr/models/lr_scheduler.py (MultiStepRestartLR :7-47,
CosineAnnealingRestartLR :50-107) plus the linear warmup applied on top by
BaseModel.update_learning_rate (base_model.py:155-177). Expressed as pure
step->multiplier functions usable with optax.scale_by_schedule. All
branching is jnp-based so the schedules trace cleanly inside jitted
optimizer updates (and still evaluate on concrete host ints)."""
import math

import jax.numpy as jnp


def multi_step_restart_schedule(milestones, gamma=0.1, restarts=(0,),
                                restart_weights=(1,)):
    """Step decay with optional warm restarts.

    Returns f(step) -> lr multiplier. At each milestone the multiplier is
    scaled by gamma; at a restart step the multiplier resets to the
    corresponding restart weight and decay counting restarts.
    """
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = [float(w) for w in restart_weights]
    assert len(restarts) == len(restart_weights)

    def schedule(step):
        step = jnp.asarray(step)
        # active restart segment = last restart <= step
        seg = jnp.maximum(
            sum((step >= r).astype(jnp.int32) for r in restarts) - 1, 0)
        weight = jnp.take(jnp.asarray(restart_weights), seg)
        # per-segment decay count: milestones after that segment's start
        decays = []
        for s, seg_start in enumerate(restarts):
            local = [m for m in milestones if m > seg_start]
            decays.append(sum((step >= m).astype(jnp.int32)
                              for m in local) if local else
                          jnp.zeros((), jnp.int32))
        n_decays = jnp.take(jnp.stack([jnp.asarray(d) for d in decays]),
                            seg)
        return weight * (gamma ** n_decays.astype(jnp.float32))

    return schedule


def cosine_annealing_restart_schedule(periods, restart_weights=(1,),
                                      eta_min_ratio=0.0):
    """Cosine annealing with restarts (lr_scheduler.py:50-107).

    ``periods[i]`` is the length of cycle i; ``restart_weights[i]`` scales
    the cycle's peak. ``eta_min_ratio`` is eta_min as a fraction of the
    base LR."""
    assert len(periods) == len(restart_weights)
    cumulative = [sum(periods[:i + 1]) for i in range(len(periods))]
    starts = [0] + cumulative[:-1]

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.minimum(
            sum((step >= c).astype(jnp.int32) for c in cumulative),
            len(periods) - 1)
        start = jnp.take(jnp.asarray(starts), idx)
        period = jnp.take(jnp.asarray(periods), idx)
        weight = jnp.take(jnp.asarray([float(w) for w in restart_weights]),
                          idx)
        t = jnp.clip(step - start, 0, period).astype(jnp.float32)
        return (eta_min_ratio + weight * 0.5 * (1 - eta_min_ratio) *
                (1 + jnp.cos(math.pi * t / period.astype(jnp.float32))))

    return schedule


def with_warmup(schedule, warmup_iter=-1):
    """Linear LR warmup over the first ``warmup_iter`` steps
    (base_model.py:155-177); -1 disables."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        step = jnp.asarray(step)
        base = schedule(step)
        scale = jnp.where(step < warmup_iter,
                          (step.astype(jnp.float32) + 1) / warmup_iter, 1.0)
        return base * scale

    return warmed


def build_schedule(train_opt):
    """Build the schedule multiplier from the YAML ``train`` block
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
            train_opt['periods'],
            restart_weights=train_opt.get('restart_weights') or [1],
            eta_min_ratio=(train_opt.get('eta_min', 0) or 0) /
            max(train_opt.get('lr_g', 1e-4) or 1e-4, 1e-12))
    else:
        raise NotImplementedError(f'lr_scheme {scheme} is not implemented.')
    return with_warmup(sched, train_opt.get('warmup_iter', -1))
