"""Benchmark regression gate: compare a measured number to its pinned floor.

Single-chip perf sits at thoroughly documented measured floors
(docs/PERFORMANCE.md closures); the job of the benches is no longer to
find speed but to not LOSE it silently. Every bench JSON line therefore
carries a ``vs_pinned`` ratio and, when the measurement regresses past
tolerance, a loud ``regression`` flag (plus a stderr warning so it shows
even when only the JSON line is machine-parsed).

Pinned values (re-pin when a real improvement lands, with the measurement
protocol that produced them):
- serving: 10.69 img/s, bench.py batch-24 pipelined protocol
  (BENCH_r03 10.698 / BENCH_r04 10.697 — reproducible to ~0.1%).
- stage-3 GAN train: 341 ms/iter ON-CHIP compute, bench_train.py
  --decompose step median at batch 9 / 160 px bf16 gathers
  (CLAUDE.md "Measured floors"). The production LOOP number (~358 ms)
  is tunnel/host-sensitive and is NOT gated.
"""
import sys

PINNED_SERVING_IPS = 10.69       # img/s, higher is better
PINNED_GAN_STEP_MS = 341.0       # ms/iter on-chip, lower is better


def gate(value, pinned, higher_is_better=True, tolerance=0.10):
    """Compare ``value`` to ``pinned``; return JSON-mergeable gate fields.

    Args:
        value: the fresh measurement.
        pinned: the pinned floor (best reproducible number to date).
        higher_is_better: metric direction (img/s True, ms False).
        tolerance: allowed fractional regression before flagging
            (serving reproduces to ~0.1%, train compute to a few %;
            default 10% absorbs host/day variance without hiding a
            real loss).

    Returns:
        dict with ``vs_pinned`` (value/pinned — >=1.0 means at-or-above
        the floor for higher-is-better metrics, <=1.0 for
        lower-is-better) and, only when the regression exceeds
        tolerance, ``regression: True`` plus a stderr warning.
    """
    if pinned <= 0:
        raise ValueError('pinned must be positive')
    ratio = value / pinned
    out = {'vs_pinned': round(ratio, 3)}
    regressed = (ratio < 1.0 - tolerance) if higher_is_better \
        else (ratio > 1.0 + tolerance)
    if regressed:
        out['regression'] = True
        print(f'WARNING: benchmark regression: measured {value:g} vs '
              f'pinned {pinned:g} '
              f'({"-" if higher_is_better else "+"}{abs(1 - ratio):.1%}, '
              f'tolerance {tolerance:.0%}) — see '
              f'c2matching_tpu/utils/bench_gate.py for the pin protocol',
              file=sys.stderr)
    return out
