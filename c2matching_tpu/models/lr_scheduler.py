"""Learning-rate schedules.

Parity target: mmsr/models/lr_scheduler.py (MultiStepRestartLR :7-47,
CosineAnnealingRestartLR :50-107) plus the linear warmup applied on top by
BaseModel.update_learning_rate (base_model.py:155-177). Expressed as pure
step->multiplier functions usable with optax.scale_by_schedule (the
schedule multiplies a base LR)."""
import math
from bisect import bisect_right


def multi_step_restart_schedule(milestones, gamma=0.1, restarts=(0,),
                                restart_weights=(1,)):
    """Step decay with optional warm restarts.

    Returns f(step) -> lr multiplier. At each milestone the multiplier is
    scaled by gamma; at a restart step the multiplier resets to the
    corresponding restart weight and decay counting restarts.
    """
    milestones = sorted(milestones)
    restarts = list(restarts)
    restart_weights = list(restart_weights)
    assert len(restarts) == len(restart_weights)

    def schedule(step):
        # find the active restart segment
        seg = 0
        for i, r in enumerate(restarts):
            if step >= r:
                seg = i
        seg_start = restarts[seg]
        weight = restart_weights[seg]
        local_milestones = [m for m in milestones if m > seg_start]
        n_decays = bisect_right(local_milestones, step)
        return weight * (gamma ** n_decays)

    return schedule


def cosine_annealing_restart_schedule(periods, restart_weights=(1,),
                                      eta_min_ratio=0.0):
    """Cosine annealing with restarts (lr_scheduler.py:50-107).

    ``periods[i]`` is the length of cycle i; ``restart_weights[i]`` scales
    the cycle's peak. ``eta_min_ratio`` is eta_min as a fraction of the
    base LR (the reference passes an absolute eta_min; dividing by base_lr
    gives this ratio)."""
    assert len(periods) == len(restart_weights)
    cumulative = [sum(periods[:i + 1]) for i in range(len(periods))]

    def schedule(step):
        idx = bisect_right(cumulative, step)
        idx = min(idx, len(periods) - 1)
        nearest_restart = 0 if idx == 0 else cumulative[idx - 1]
        period = periods[idx]
        weight = restart_weights[idx]
        t = min(max(step - nearest_restart, 0), period)
        return (eta_min_ratio + weight * 0.5 * (1 - eta_min_ratio) *
                (1 + math.cos(math.pi * t / period)))

    return schedule


def with_warmup(schedule, warmup_iter=-1):
    """Linear LR warmup over the first ``warmup_iter`` steps
    (base_model.py:155-177); -1 disables."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        base = schedule(step)
        if step < warmup_iter:
            return base * (step + 1) / warmup_iter
        return base

    return warmed


def build_schedule(train_opt):
    """Build the schedule multiplier from the YAML ``train`` block
    (base_model.py:77-108 dispatch on lr_scheme)."""
    scheme = train_opt.get('lr_scheme', 'MultiStepLR')
    if scheme in ('MultiStepLR', 'MultiStepRestartLR'):
        sched = multi_step_restart_schedule(
            train_opt.get('lr_steps', []) or [],
            gamma=train_opt.get('lr_gamma', 0.1) or 0.1,
            restarts=train_opt.get('restarts', [0]) or [0],
            restart_weights=train_opt.get('restart_weights', [1]) or [1])
    elif scheme == 'CosineAnnealingRestartLR':
        sched = cosine_annealing_restart_schedule(
            train_opt['periods'],
            restart_weights=train_opt.get('restart_weights', [1]) or [1],
            eta_min_ratio=train_opt.get('eta_min', 0) /
            max(train_opt.get('lr_g', 1e-4), 1e-12))
    else:
        raise NotImplementedError(f'lr_scheme {scheme} is not implemented.')
    return with_warmup(sched, train_opt.get('warmup_iter', -1))
