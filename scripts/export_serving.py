#!/usr/bin/env python
"""Export the fused serving forward as a serialized StableHLO artifact.

The reference has no deployment story beyond running torch in-process
(mmsr/test.py). This is the TPU-native one: `jax.export` serializes the
whole fused pipeline (contrastive extraction -> patch matching -> VGG ref
features -> restoration) for one static serving bucket shape, with the
weights baked in as constants — a self-contained artifact a serving
binary can load and call without Python model code, flax, or the
checkpoint files.

    python scripts/export_serving.py -opt options/test/<cfg>.yml \
        --batch 8 --hr 512 336 --out exports/c2matching_512x336_b8.jaxexp \
        [--platforms tpu,cpu]

The artifact serves exactly one (batch, HR-height, HR-width) bucket
(static shapes — the XLA compilation model; export once per bucket, as
eval bucketing does in-process). Inputs of the exported callable, all
float32 NHWC in [0, 1]:

    img_in_up (B, H, W, 3)   bicubic-upsampled input
    img_ref   (B, H, W, 3)   reference image
    img_in_lq (B, H/4, W/4, 3) low-res input

Output: (B, H, W, 3) x4 restoration. Round-trip:

    from jax import export
    exp = export.deserialize(open(path, 'rb').read())
    out = exp.call(img_in_up, img_ref, img_in_lq)

Fidelity vs the in-process eval path is pinned by tests/test_export.py.

Multi-platform artifacts: `--platforms cpu,tpu` from a CPU process
(C2MATCHING_PLATFORM=cpu) emits ONE artifact loadable on both platforms
— on CPU the matcher takes the platform-neutral XLA formulation, which
lowers everywhere (verified: 44 MB dual-platform artifact). Exporting
FROM a TPU process instead embeds the Pallas patch-match kernel (the
faster matcher), making that artifact TPU-only; prefer it for
TPU-fleet deployment.
"""
import os

if os.environ.get('C2MATCHING_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['C2MATCHING_PLATFORM'])

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))

import jax
import jax.numpy as jnp


def build_serving_fn(model):
    """Fused (img_in_up, img_ref, img_in_lq) -> SR output closure over the
    model's weights (constants in the exported module)."""

    def serve(img_in_up, img_ref, img_in_lq):
        pre_offset, ref_feat = model._match_graph(
            model.vars_extractor, model.vars_map, img_in_up, img_ref)
        output, _stats = model._g_forward_with_stats(
            model.vars_g['params'], img_in_lq, pre_offset, ref_feat)
        return output

    return serve


def export_serving(model, batch, hr_h, hr_w, platforms=None):
    """jax.export the fused serving fn at one static bucket shape."""
    from jax import export as jexport
    if hr_h % 4 or hr_w % 4:
        raise ValueError('HR shape must be divisible by the x4 scale')
    spec = jax.ShapeDtypeStruct
    args = (spec((batch, hr_h, hr_w, 3), jnp.float32),
            spec((batch, hr_h, hr_w, 3), jnp.float32),
            spec((batch, hr_h // 4, hr_w // 4, 3), jnp.float32))
    fn = jax.jit(build_serving_fn(model))
    kwargs = {'platforms': platforms} if platforms else {}
    return jexport.export(fn, **kwargs)(*args)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='test/serving option YAML (weights via its '
                             'path: keys; random seeded init without)')
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--hr', type=int, nargs=2, default=(512, 336),
                        metavar=('H', 'W'),
                        help='HR bucket shape (multiples of 4)')
    parser.add_argument('--out', type=str, required=True)
    parser.add_argument('--platforms', type=str, default=None,
                        help='comma-separated lowering platforms, e.g. '
                             '"tpu,cpu" (default: current backend)')
    args = parser.parse_args()

    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse

    opt = dict_to_nonedict(parse(args.opt, is_train=False))
    model = create_model(opt)

    platforms = args.platforms.split(',') if args.platforms else None
    exp = export_serving(model, args.batch, args.hr[0], args.hr[1],
                         platforms)
    data = exp.serialize()
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    with open(args.out, 'wb') as f:
        f.write(data)
    print(f'exported {args.out}: {len(data) / 1e6:.1f} MB, '
          f'platforms={list(exp.platforms)}, '
          f'batch={args.batch}, hr={args.hr[0]}x{args.hr[1]}')


if __name__ == '__main__':
    main()
