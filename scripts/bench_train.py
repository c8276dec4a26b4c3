#!/usr/bin/env python
"""Training-throughput benchmark: ms/GAN-iter for stage-3 at the
reference's production shape (batch 9, 160px GT), one chip.

Companion to /bench.py (eval serving throughput). Prints ONE JSON line:
{"metric", "value", "unit", "samples_per_sec"}.

Methodology (see CLAUDE.md "Platform gotchas"): the fused donated GAN
jit is exercised through the real model API (feed_data ->
optimize_parameters) with distinct batches per iteration, and each
iteration is forced by fetching a loss scalar — on the tunneled
platform block_until_ready alone does not force execution. The ~36 ms
tunnel fetch round-trip is INCLUDED (it is amortized at production
print_freq, where log fetches happen per-print, not per-iter).

Round-2 measurements this reproduces (v5e): f32 611 ms/iter; with
``gather_dtype: bfloat16`` (the default here, matching the documented
serving/training knob) 547 ms/iter = 16.5 samples/s.

Usage: PYTHONPATH=. python scripts/bench_train.py [--f32]
"""
import argparse
import json
import statistics
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
    ap.add_argument('--iters', type=int, default=5)
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

    ts = []
    for i in range(n):
        model.feed_data(batches[i])
        t0 = time.time()
        model.optimize_parameters(i + 3)
        float(model.log_dict[loss_key])       # force through the tunnel
        ts.append(time.time() - t0)

    dt = statistics.median(ts)
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
