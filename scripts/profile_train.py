#!/usr/bin/env python
"""Per-phase training profile of the stage-3 GAN iteration.

Times each phase of the fused GAN step as its own (unfused) jit at the
production configuration (batch 9, 160px GT, bf16 DCN gathers) and
prints a JSON table with the XLA cost-model FLOPs/bytes and achieved
TFLOP/s per phase — the training mirror of profile_serving.py, built
from the model's own subgraph builders so the profiled code is the
production code:

  match      extractor + correspondence generation (stop-gradient input
             stage of every train step)
  g_forward  generator forward only (the DCN decoder)
  g_step     G phase of the GAN iteration: forward + loss head (pixel +
             perceptual + GAN-G through train-mode D) + backward +
             Adam update              (_build_g_step)
  loss_head  the loss head alone, incl. its backward w.r.t. the G
             output (isolates VGG-perceptual + D-for-G cost inside
             g_step)
  d_step     D phase: real/fake forwards + WGAN-GP grad-of-grad +
             Adam update              (_build_d_step)

match + g_step + d_step ≈ the whole iteration: the net phase sum
(~327 ms at HEAD) runs a couple of percent under the fused step's
~341 ms on-chip (the fused step adds optimizer/EMA bookkeeping but
saves one G forward via a single jax.vjp; see docs/PERFORMANCE.md
"Training"). Phase timings use the shared fused-checksum protocol
(utils/prof.py): raw numbers include the calibrated ~27-29 ms tunnel
round-trip, net numbers subtract it — see
.claude/skills/verify/SKILL.md.

    python scripts/profile_train.py [--iters 4] [--total]

--total additionally times the real fused donated step through
model.feed_data/optimize_parameters (one extra multi-minute cold
compile; bench_train.py is the dedicated tool for that number).
"""
import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))


from c2matching_tpu.utils.prof import calibrate_fetch, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--batch', type=int, default=9)
    ap.add_argument('--gt-size', type=int, default=160)
    ap.add_argument('--total', action='store_true',
                    help='also time the fused donated GAN step (extra '
                         'cold compile; same number as bench_train.py '
                         '--per-iter-fetch)')
    args = ap.parse_args()

    import jax
    from c2matching_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils.options import parse

    opt = parse('options/train/debug_stage3_synth.yml', is_train=True)
    opt['train']['net_g_pretrain_steps'] = 0
    opt['network_g']['gather_dtype'] = 'bfloat16'
    model = create_model(opt)

    b, gt = args.batch, args.gt_size
    lq = gt // 4
    n = args.iters

    def mk(seed, shape):
        return jnp.asarray(np.random.RandomState(seed)
                           .rand(*shape).astype(np.float32))

    ups = [mk(100 + i, (b, gt, gt, 3)) for i in range(n + 1)]
    refs = [mk(200 + i, (b, gt, gt, 3)) for i in range(n + 1)]
    lqs = [mk(300 + i, (b, lq, lq, 3)) for i in range(n + 1)]
    gts = [mk(400 + i, (b, gt, gt, 3)) for i in range(n + 1)]
    rngs = [jax.random.PRNGKey(i) for i in range(n + 1)]

    g_params = model.vars_g['params']

    # --- match: extractor + correspondence generation
    t_match = timed(model._match,
                    [(model.vars_extractor, model.vars_map, ups[i], refs[i])
                     for i in range(n + 1)], n)
    po, rf = model._match(model.vars_extractor, model.vars_map, ups[0],
                          refs[0])

    # --- generator forward only
    t_gfwd = timed(model._forward,
                   [(g_params, lqs[i], po, rf) for i in range(n + 1)], n)
    output, _stats = model._forward(g_params, lqs[0], po, rf)

    # --- loss head: pixel + perceptual + GAN-G (train-mode D), with its
    # backward w.r.t. the G output — the cotangent source of the G phase
    @jax.jit
    def loss_head(out, gt_img, d_vars, perc_vars):
        def f(o):
            total, logs, dstate = model._out_losses(
                o, gt_img, d_vars, perc_vars, model.net_d is not None)
            return total, (logs, dstate)
        (l, aux), dout = jax.value_and_grad(f, has_aux=True)(out)
        return l, dout

    t_head = timed(loss_head,
                   [(output, gts[i], model.vars_d, model.vars_perceptual)
                    for i in range(n + 1)], n)

    # --- full G phase: forward + loss head + backward + Adam update
    def g_step(gp, opt_g, lq_img, gt_img, po_, rf_, d_vars, perc_vars):
        return model._g_step(gp, opt_g, {'img_in_lq': lq_img,
                                         'img_in': gt_img},
                             po_, rf_, d_vars, perc_vars)

    t_gstep = timed(g_step,
                    [(g_params, model.opt_state_g, lqs[i], gts[i], po, rf,
                      model.vars_d, model.vars_perceptual)
                     for i in range(n + 1)], n)

    # --- D phase: real/fake forwards + WGAN-GP grad-of-grad + Adam
    fake = jax.lax.stop_gradient(output)
    t_dstep = timed(model._d_step,
                    [(model.vars_d, model.opt_state_d, gts[i], fake,
                      rngs[i]) for i in range(n + 1)], n)

    # per-iteration protocol overhead (dispatches + fetch)
    t_fetch = calibrate_fetch(n)

    rows = [('match', t_match), ('g_forward', t_gfwd),
            ('loss_head', t_head), ('g_step', t_gstep),
            ('d_step', t_dstep)]
    out = {'batch': b, 'gt_size': gt,
           'fetch_overhead_ms': round(t_fetch * 1e3, 1)}
    for name, t in rows:
        out[f'{name}_ms'] = round(t * 1e3, 1)
        out[f'{name}_ms_net'] = round((t - t_fetch) * 1e3, 1)
    # phase sum over one iteration = match + G phase + D phase
    # (g_forward and loss_head are subsets of g_step, not added)
    total_net = sum(t - t_fetch for name, t in rows
                    if name in ('match', 'g_step', 'd_step'))
    out['phase_sum_net_ms'] = round(total_net * 1e3, 1)
    out['phase_sum_samples_per_s'] = round(b / total_net, 1)

    # XLA cost model per phase (flops = useful arithmetic, bytes = HBM
    # traffic estimate); achieved rates from the fetch-subtracted times
    lowered = {
        'match': model._match.lower(model.vars_extractor, model.vars_map,
                                    ups[0], refs[0]),
        'g_forward': model._forward.lower(g_params, lqs[0], po, rf),
        'loss_head': loss_head.lower(output, gts[0], model.vars_d,
                                     model.vars_perceptual),
        'g_step': model._g_step.lower(
            g_params, model.opt_state_g,
            {'img_in_lq': lqs[0], 'img_in': gts[0]}, po, rf, model.vars_d,
            model.vars_perceptual),
        'd_step': model._d_step.lower(model.vars_d, model.opt_state_d,
                                      gts[0], fake, rngs[0]),
    }
    times = dict(rows)
    for name, low in lowered.items():
        ca = low.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gf = ca.get('flops', 0.0) / 1e9
        gb = ca.get('bytes accessed', 0.0) / 1e9
        net = max(times[name] - t_fetch, 1e-9)
        out[f'{name}_gflops'] = round(gf, 1)
        out[f'{name}_hbm_gb'] = round(gb, 2)
        out[f'{name}_tflops_per_s'] = round(gf / net / 1e3, 2)
        out[f'{name}_hbm_gb_per_s'] = round(gb / net, 1)

    if args.total:
        # the real fused donated step, per-iter-fetch protocol
        batches = [{'img_in_up': np.asarray(ups[i]),
                    'img_in': np.asarray(gts[i]),
                    'img_ref': np.asarray(refs[i]),
                    'img_in_lq': np.asarray(lqs[i])} for i in range(n + 1)]
        model.feed_data(batches[-1])
        model.optimize_parameters(1)          # compile + settle donation
        float(model.log_dict['l_g_pix'])
        ts = []
        for i in range(n):
            model.feed_data(batches[i])
            t0 = time.time()
            model.optimize_parameters(i + 2)
            float(model.log_dict['l_g_pix'])
            ts.append(time.time() - t0)
        out['fused_step_ms'] = round(sorted(ts)[len(ts) // 2] * 1e3, 1)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
