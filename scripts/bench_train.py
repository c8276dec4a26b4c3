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
    ap.add_argument('--batch', type=int, default=9)
    ap.add_argument('--gt-size', type=int, default=160)
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--unroll', type=int, default=1,
                    help='trunk_unroll for network_g (see '
                         'arch_util.ResBlockStack)')
    args = ap.parse_args()

    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils.options import parse

    opt = parse('options/train/debug_stage3_synth.yml', is_train=True)
    opt['train']['net_g_pretrain_steps'] = (
        10 ** 9 if args.pretrain else 0)
    if not args.f32:
        opt['network_g']['gather_dtype'] = 'bfloat16'
    if args.unroll != 1:
        opt['network_g']['trunk_unroll'] = args.unroll

    b, gt = args.batch, args.gt_size
    lq = gt // 4

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return {
            'img_in_lq': r.rand(b, lq, lq, 3).astype(np.float32),
            'img_in_up': r.rand(b, gt, gt, 3).astype(np.float32),
            'img_in': r.rand(b, gt, gt, 3).astype(np.float32),
            'img_ref': r.rand(b, gt, gt, 3).astype(np.float32),
        }

    model = create_model(opt)
    n = args.iters
    batches = [mk_batch(100 + i) for i in range(n + 2)]
    loss_key = 'l_pix' if args.pretrain else 'l_g_pix'
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
    print(json.dumps({
        'metric': (f'ms/{"pretrain" if args.pretrain else "GAN"}-iter, '
                   f'stage-3 batch {b} / {gt}px GT '
                   f'({"f32" if args.f32 else "bf16 gathers"})'),
        'value': round(dt * 1e3, 1),
        'unit': 'ms',
        'samples_per_sec': round(b / dt, 1),
    }))


if __name__ == '__main__':
    main()
