#!/usr/bin/env python
"""Throughput benchmark: images/sec/chip for x4 CUFED5-scale RefSR.

Runs the full inference pipeline (contrastive extraction -> dense patch
matching -> VGG19 ref features -> correspondence-seeded restoration) at a
representative CUFED5 eval shape (HR 512x336 -> LR 128x84; CUFED5 images
are ~500x332, padded to static buckets in eval) on one chip, in the
serving configuration:

- the whole pipeline is ONE jit (match + restore fused), with the three
  param trees passed as jit ARGUMENTS (device buffers), not closed-over
  constants — matching real serving dataflow so XLA cannot constant-fold
  weight-dependent work out of the timed path;
- batch 24 (throughput serving; batch-1 latency is ~132 ms/image;
  batch 28 measured SLOWER, 10.33 img/s — past the sweet spot; batch 32
  fails to compile — HBM);
- bf16 deformable-conv gathers (``gather_dtype='bfloat16'``): the gather
  is the byte-bound hot path, halving its bytes is +25% throughput at
  ~0.4% relative feature rounding (tests/test_archs.py pins closeness
  to the f32 model). Everything else stays f32;
- bf16 correlation operands in the patch matcher
  (``match_dtype='bfloat16'``): single-pass MXU matmul, f32
  accumulation/normalization (tests/test_patch_match.py pins agreement);
- fully unrolled residual trunks (``trunk_unroll=16``): the rolled
  nn.scan trunk pays a per-block loop barrier worth ~35% of trunk time
  at eval scales (profiler-traced, then measured standalone: 194 vs
  125 ms for body_large at batch 16); unrolling the whole pipeline
  measured +5.3% end to end. Identical params/checkpoints;
- a persistent XLA compilation cache (<repo>/.xla_cache): the batch-16
  unrolled compile is minutes cold through the remote-compile tunnel
  but seconds warm, which is what makes the fastest config shippable
  inside the bench time budget.

Measured sweep on a v5e chip (round 2, params closed over): batch 1 f32
6.99 img/s, batch 1 bf16 7.60, batch 4 bf16 8.46, batch 8 bf16 9.62
(9.83 with bf16 match), batch 16 bf16 9.77 (10.01 with bf16 match).
Round 3: params as jit arguments 9.86; + trunk_unroll=16 -> 10.41;
batch 24 10.48; + pipelined dispatch -> 10.60 (batch 16 pipelined:
10.57). bf16 trunk convs re-measured standalone at serving shapes and
still LOSE on this chip (large trunk 166 -> 190 ms) — conv compute
stays f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes:
- params are initialized at a small spatial size (conv params are
  size-independent) because eager init at full size is slow through the
  remote device tunnel;
- THROUGHPUT protocol (round 3): all iterations are dispatched
  back-to-back and each result is folded into a running scalar checksum
  fetched once at the end — the data dependency forces every iteration
  to execute, while the ~36 ms/iter host fetch round-trip of the
  tunneled platform overlaps with compute, exactly as a real server
  overlaps result readback. (block_until_ready alone does not force
  execution here, so per-iter timing must fetch per iter and eats the
  round-trip: 10.48 img/s measured that way at batch 24.)
- inputs differ per iteration to defeat any result memoization.

Baseline: the reference publishes no throughput (BASELINE.md). The driver
target is >=5x a V100 running the reference; a V100-era C2-Matching
inference measures ~0.7-0.8 img/s at CUFED5 size (chunked conv2d matching
+ DCNv2). vs_baseline is computed against 0.75 img/s — an estimate, noted
here explicitly, not a repo-published number.
"""
import json
import os
import time

V100_BASELINE_IPS = 0.75  # estimated reference V100 throughput (see above)


def main():
    import argparse
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    ap = argparse.ArgumentParser()
    ap.add_argument('--hr', type=int, nargs=2, default=(512, 336),
                    metavar=('H', 'W'),
                    help='HR bucket shape (default: the CUFED5 bucket '
                         '512 336; e.g. --hr 480 320 for a WR-SR-scale '
                         'second bucket)')
    ap.add_argument('--batch', type=int, default=24)
    args = ap.parse_args()

    import jax
    # persistent compile cache: cold batch-24 compile is minutes via the
    # remote-compile tunnel, warm is seconds (shared config helper)
    from c2matching_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp
    from c2matching_tpu.models.archs import (ContrasExtractorSep,
                                             CorrespondenceGenerationArch,
                                             RestorationNet)

    gt_h, gt_w = args.hr    # default: CUFED5-scale x16 static bucket
    lr_h, lr_w = gt_h // 4, gt_w // 4
    batch = args.batch
    default_shape = (gt_h, gt_w, batch) == (512, 336, 24)

    rng = jax.random.PRNGKey(0)

    def mk(k, shape):
        return jax.random.uniform(jax.random.PRNGKey(k), shape)

    ext = ContrasExtractorSep()
    cg = CorrespondenceGenerationArch(match_dtype='bfloat16')
    net = RestorationNet(gather_dtype='bfloat16', trunk_unroll=16)

    # init at small spatial size; conv param shapes are size-independent
    s = 64
    up_s, ref_s, lr_s = (jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
                         jnp.zeros((1, s // 4, s // 4, 3)))
    ext_params = jax.jit(ext.init)(rng, up_s, ref_s)
    feats = jax.jit(ext.apply)(ext_params, up_s, ref_s)
    cg_params = jax.jit(cg.init)(rng, feats, ref_s)
    po_s, rf_s = jax.jit(cg.apply)(cg_params, feats, ref_s)
    g_params = jax.jit(net.init)(rng, lr_s, po_s, rf_s)

    @jax.jit
    def full(ext_params, cg_params, g_params, up, ref, lr):
        po, rf = cg.apply(cg_params, ext.apply(ext_params, up, ref), ref)
        return net.apply(g_params, lr, po, rf)

    n_iters = 6
    ins = [(mk(100 + i, (batch, gt_h, gt_w, 3)),
            mk(200 + i, (batch, gt_h, gt_w, 3)),
            mk(300 + i, (batch, lr_h, lr_w, 3)))
           for i in range(n_iters + 1)]

    # warmup / compile — including the scalar accumulate add used in the
    # timed loop, so no first-use compile lands inside the timed region
    float(jnp.float32(0)
          + jnp.sum(full(ext_params, cg_params, g_params, *ins[-1])))

    # throughput: dispatch all iters back-to-back, chain checksums, fetch
    # once — forces every iteration to execute while overlapping the host
    # fetch round-trip with compute (see module docstring).
    t0 = time.time()
    acc = jnp.float32(0)
    for i in range(n_iters):
        acc = acc + jnp.sum(full(ext_params, cg_params, g_params, *ins[i]))
    float(acc)
    dt = (time.time() - t0) / n_iters

    ips = batch / dt
    from c2matching_tpu.utils.bench_gate import (PINNED_SERVING_IPS, gate)
    out = {
        'metric': f'images/sec/chip at 4x RefSR ({gt_h}x{gt_w} HR), '
                  f'batch {batch} serving config (bf16 DCN gathers + bf16 '
                  'match + unrolled trunks, params as device buffers, '
                  'pipelined dispatch)',
        'value': round(ips, 3),
        'unit': 'images/sec',
        'vs_baseline': round(ips / V100_BASELINE_IPS, 2),
    }
    if default_shape:
        # regression gate vs the pinned measured floor (reproducible to
        # ~0.1% across rounds; 5% tolerance flags any real loss) — only
        # the default CUFED5 bucket has a pinned floor
        out.update(gate(ips, PINNED_SERVING_IPS, higher_is_better=True,
                        tolerance=0.05))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
