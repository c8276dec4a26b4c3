#!/usr/bin/env python
"""Per-component serving profile: extractor / matcher / generator split.

Times each pipeline stage as its own jit at the serving configuration
(bf16 gathers + bf16 match + unrolled trunks, params as device buffers)
and prints a JSON table. This is the in-tree, reproducible version of the
round-3 component measurements recorded in CLAUDE.md / bench.py.

Measurement protocol (see .claude/skills/verify/SKILL.md): on the axon
tunnel `block_until_ready` does not force execution, so every timing
fetches a scalar checksum per iteration with distinct inputs; each
fetch-forced number therefore INCLUDES the ~36 ms host round-trip —
reported both raw and net of the calibrated fetch overhead.

    python scripts/profile_serving.py [--batch 16] [--iters 4]
"""
import argparse
import json
import os.path as osp
import sys
sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))


from c2matching_tpu.utils.prof import calibrate_fetch, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--cost', action='store_true',
                    help='add XLA cost-model flops/bytes per stage and '
                         'achieved TFLOP/s / HBM GB/s (net of fetch)')
    args = ap.parse_args()

    import jax
    from c2matching_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp
    from c2matching_tpu.models.archs import (ContrasExtractorSep,
                                             CorrespondenceGenerationArch,
                                             RestorationNet)

    gt_h, gt_w = 512, 336
    lr_h, lr_w = gt_h // 4, gt_w // 4
    b = args.batch
    rng = jax.random.PRNGKey(0)

    ext = ContrasExtractorSep()
    cg = CorrespondenceGenerationArch(match_dtype='bfloat16')
    net = RestorationNet(gather_dtype='bfloat16', trunk_unroll=16)

    s = 64
    up_s, ref_s, lr_s = (jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)),
                         jnp.zeros((1, s // 4, s // 4, 3)))
    ext_params = jax.jit(ext.init)(rng, up_s, ref_s)
    feats_s = jax.jit(ext.apply)(ext_params, up_s, ref_s)
    cg_params = jax.jit(cg.init)(rng, feats_s, ref_s)
    po_s, rf_s = jax.jit(cg.apply)(cg_params, feats_s, ref_s)
    g_params = jax.jit(net.init)(rng, lr_s, po_s, rf_s)

    def mk(k, shape):
        return jax.random.uniform(jax.random.PRNGKey(k), shape)

    n = args.iters
    ups = [mk(100 + i, (b, gt_h, gt_w, 3)) for i in range(n + 1)]
    refs = [mk(200 + i, (b, gt_h, gt_w, 3)) for i in range(n + 1)]
    lrs = [mk(300 + i, (b, lr_h, lr_w, 3)) for i in range(n + 1)]

    ext_j = jax.jit(ext.apply)
    t_ext = timed(ext_j, [(ext_params, ups[i], refs[i])
                          for i in range(n + 1)], n)

    feats = ext_j(ext_params, ups[0], refs[0])
    cg_j = jax.jit(cg.apply)
    t_cg = timed(cg_j, [(cg_params, feats, refs[i])
                        for i in range(n + 1)], n)

    po, rf = cg_j(cg_params, feats, refs[0])
    g_j = jax.jit(net.apply)
    t_g = timed(g_j, [(g_params, lrs[i], po, rf)
                      for i in range(n + 1)], n)

    # calibrate the per-iteration protocol overhead (dispatches + fetch)
    t_fetch = calibrate_fetch(n)

    rows = [('extractor', t_ext), ('matcher', t_cg), ('generator', t_g)]
    out = {'batch': b, 'fetch_overhead_ms': round(t_fetch * 1e3, 1)}
    for name, t in rows:
        out[f'{name}_ms'] = round(t * 1e3, 1)
        out[f'{name}_ms_net'] = round((t - t_fetch) * 1e3, 1)
    total_net = sum(t - t_fetch for _, t in rows)
    out['total_net_ms'] = round(total_net * 1e3, 1)
    out['net_img_per_s'] = round(b / total_net, 2)

    if args.cost:
        # XLA's own cost model for the compiled executables (flops =
        # useful arithmetic, bytes = HBM traffic estimate); achieved
        # rates use the fetch-subtracted times above
        lowered = {
            'extractor': ext_j.lower(ext_params, ups[0], refs[0]),
            'matcher': cg_j.lower(cg_params, feats, refs[0]),
            'generator': g_j.lower(g_params, lrs[0], po, rf),
        }
        for (name, t), low in zip(rows, lowered.values()):
            ca = low.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            gf = ca.get('flops', 0.0) / 1e9
            gb = ca.get('bytes accessed', 0.0) / 1e9
            net = max(t - t_fetch, 1e-9)
            out[f'{name}_gflops'] = round(gf, 1)
            out[f'{name}_hbm_gb'] = round(gb, 2)
            out[f'{name}_tflops_per_s'] = round(gf / net / 1e3, 2)
            out[f'{name}_hbm_gb_per_s'] = round(gb / net, 1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
