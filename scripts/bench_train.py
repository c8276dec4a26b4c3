#!/usr/bin/env python
"""Training-throughput benchmark: ms/GAN-iter for stage-3 at the
reference's production shape (batch 9, 160px GT), one chip.

Companion to /bench.py (eval serving throughput). Prints ONE JSON line:
{"metric", "value", "unit", "samples_per_sec"}.

Methodology (see CLAUDE.md "Platform gotchas"): the fused donated GAN
jit is exercised through the real model API (feed_data ->
optimize_parameters) with distinct batches per iteration. Default
protocol = production run-ahead (mmsr/train.py fetches logs only at
print_freq): iterations are dispatched back to back so host->device
batch transfers and tunnel fetches overlap device compute, and every
iteration is forced through one final fetched sum of all losses (the
params/opt-state chain already serializes the steps). --per-iter-fetch
reverts to the older latency protocol (each iteration individually
fetch-forced; transfer + ~36 ms fetch land inside every step).

Reference numbers at HEAD (v5e, 2026-08-19, idle host): stage-3 GAN
with ``gather_dtype: bfloat16`` (the default here) = ~341 ms/iter
on-chip compute (--decompose), 358 ms/iter production run-ahead,
545 ms/iter --per-iter-fetch (the transfer + ~27 ms fetch land inside
every step; f32 per-iter-fetch was 611). Stages 1/2 compute is ~6-7
ms/iter — their loop time is the 9.4 MB/iter tunnel transfer, which
drifts with tunnel weather (stage-1 per-iter-fetch measured 71-80 ms on
2026-08-18 and 267 ms on 2026-08-19 at identical compute); quote the
--decompose step number, not the loop number, for anything durable.
See docs/PERFORMANCE.md "Training".

Usage: PYTHONPATH=. python scripts/bench_train.py [--f32]
"""
import argparse
import json
import statistics
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--f32', action='store_true',
                    help='disable the bf16-gather knob (pure f32 step)')
    ap.add_argument('--pretrain', action='store_true',
                    help='time the MSE pretrain step instead of the GAN '
                         'iteration')
    ap.add_argument('--stage', type=int, default=3, choices=(1, 2, 3),
                    help='1 = teacher contras iter, 2 = student '
                         'distillation iter, 3 = restoration (default)')
    ap.add_argument('--batch', type=int, default=None,
                    help='default: the production batch for the stage '
                         '(8 for stages 1-2, 9 for stage 3)')
    ap.add_argument('--gt-size', type=int, default=160)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--per-iter-fetch', action='store_true',
                    help='force every iteration with its own loss fetch '
                         '(latency protocol; overstates production iter '
                         'time on a tunneled chip) instead of the default '
                         'run-ahead protocol matching mmsr/train.py')
    ap.add_argument('--decompose', action='store_true',
                    help='also report (to stderr) the on-chip step time '
                         'with the batch pre-forced onto the device, and '
                         'the batch host->device transfer time — '
                         'separates real step compute from the tunnel '
                         'transfer artifact this environment adds')
    ap.add_argument('--unroll', type=int, default=1,
                    help='trunk_unroll for network_g (see '
                         'arch_util.ResBlockStack)')
    args = ap.parse_args()

    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils.options import parse

    opt = parse(f'options/train/debug_stage{args.stage}_synth.yml',
                is_train=True)
    if args.stage == 2:
        # throughput only: random-init teacher instead of a stage-1 ckpt
        opt['path']['pretrain_model_teacher'] = None
    if args.stage == 3:
        opt['train']['net_g_pretrain_steps'] = (
            10 ** 9 if args.pretrain else 0)
        if not args.f32:
            opt['network_g']['gather_dtype'] = 'bfloat16'
        if args.unroll != 1:
            opt['network_g']['trunk_unroll'] = args.unroll

    # production batches: stages 1-2 train at batch 8, stage 3 at 9
    b = args.batch or (9 if args.stage == 3 else 8)
    gt = args.gt_size
    lq = gt // 4

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        batch = {
            'img_in_up': r.rand(b, gt, gt, 3).astype(np.float32),
            'img_in': r.rand(b, gt, gt, 3).astype(np.float32),
            'img_ref': r.rand(b, gt, gt, 3).astype(np.float32),
        }
        if args.stage == 3:
            batch['img_in_lq'] = r.rand(b, lq, lq, 3).astype(np.float32)
        else:
            # near-identity homography coordinate grids (the contras
            # stages' correspondence supervision; a valid grid keeps the
            # >=128-correspondence masking on its production path)
            from c2matching_tpu.data.contras_dataset import \
                transformed_coordinate_grid
            grids = []
            for _ in range(b):
                jitter = np.eye(3) + r.uniform(-1e-3, 1e-3, (3, 3))
                jitter[:2, 2] += r.uniform(-4, 4, 2)
                grids.append(transformed_coordinate_grid(jitter, gt, gt))
            batch['transformed_coordinate'] = np.stack(grids)
        return batch

    model = create_model(opt)
    n = args.iters
    batches = [mk_batch(100 + i) for i in range(n + 2)]
    if args.stage == 3:
        loss_key = 'l_pix' if args.pretrain else 'l_g_pix'
    else:
        loss_key = 'loss'
    for i in range(2):                        # compile + settle donation
        model.feed_data(batches[n + i])
        model.optimize_parameters(i + 1)
        float(model.log_dict[loss_key])

    if args.per_iter_fetch:
        # latency-style protocol: every iteration is individually forced
        # by fetching its loss scalar, so the host->device batch transfer
        # and the ~36 ms tunnel fetch land fully inside each timed step
        # (nothing overlaps). Overstates production iter time on a
        # tunneled chip; kept for latency analysis.
        ts = []
        for i in range(n):
            model.feed_data(batches[i])
            t0 = time.time()
            model.optimize_parameters(i + 3)
            float(model.log_dict[loss_key])   # force through the tunnel
            ts.append(time.time() - t0)
        dt = statistics.median(ts)
    else:
        # production protocol (default), mirroring mmsr/train.py: the
        # loop only fetches logs at print_freq, so Python runs ahead —
        # batch i+1's device_put and step dispatch overlap step i's
        # device compute. Forcing: every iteration's loss feeds one
        # final fetched sum, and params/opt-state chain through the
        # steps anyway, so no iteration can be skipped. One amortized
        # fetch, distinct inputs per iteration (same methodology as
        # bench.py's pipelined serving dispatch).
        import jax.numpy as jnp
        losses = []
        t0 = time.time()
        for i in range(n):
            model.feed_data(batches[i])
            model.optimize_parameters(i + 3)
            losses.append(model.log_dict[loss_key])
        assert np.isfinite(float(jnp.sum(jnp.stack(losses))))
        dt = (time.time() - t0) / n

    if args.decompose:
        import jax.numpy as jnp

        def force_batch():
            # one fetched scalar touching every batch array forces the
            # in-flight puts (block_until_ready does not, on the tunnel)
            s = sum(jnp.sum(v) for v in model.batch.values()
                    if hasattr(v, 'shape'))
            assert np.isfinite(float(s))

        step_ts, xfer_ts = [], []
        for i in range(n):
            t0 = time.time()
            model.feed_data(batches[i])
            force_batch()
            xfer_ts.append(time.time() - t0)
            t0 = time.time()
            model.optimize_parameters(i + 100)
            float(model.log_dict[loss_key])
            step_ts.append(time.time() - t0)
        mb = sum(v.nbytes for v in batches[0].values()
                 if hasattr(v, 'nbytes')) / 2 ** 20
        step_ms = statistics.median(step_ts) * 1e3
        print(f'decompose: on-chip step (+1 loss fetch) '
              f'{step_ms:.1f} ms; '
              f'batch transfer ({mb:.1f} MB, +1 fetch) '
              f'{statistics.median(xfer_ts) * 1e3:.1f} ms',
              file=sys.stderr)
        # regression gate on the ON-CHIP compute number — only for the
        # pinned configuration (stage-3 GAN, bf16 gathers, production
        # batch/size). The loop number above is tunnel/host-sensitive
        # and is deliberately not gated (CLAUDE.md: don't chase it).
        if (args.stage == 3 and not args.pretrain and not args.f32
                and args.unroll == 1 and b == 9 and gt == 160):
            from c2matching_tpu.utils.bench_gate import (
                PINNED_GAN_STEP_MS, gate)
            gate_fields = gate(step_ms, PINNED_GAN_STEP_MS,
                               higher_is_better=False, tolerance=0.10)
            print('decompose gate: '
                  f'{json.dumps({"pinned_ms": PINNED_GAN_STEP_MS, **gate_fields})}',
                  file=sys.stderr)

    if args.stage == 3:
        kind = 'pretrain' if args.pretrain else 'GAN'
        detail = 'f32' if args.f32 else 'bf16 gathers'
    else:
        kind = 'teacher-contras' if args.stage == 1 else 'student-distill'
        detail = 'f32'
    print(json.dumps({
        'metric': (f'ms/{kind}-iter, '
                   f'stage-{args.stage} batch {b} / {gt}px GT '
                   f'({detail})'),
        'value': round(dt * 1e3, 1),
        'unit': 'ms',
        'samples_per_sec': round(b / dt, 1),
    }))


if __name__ == '__main__':
    main()
