#!/usr/bin/env python
"""Generate a tiny synthetic CUFED-like dataset tree for tests/benchmarks.

Real CUFED/CUFED5/WR-SR images are not bundled (datasets/DATASETS.md
documents the real layouts). This writes deterministic structured images
in either layout (reference: datasets/DATASETS.md "Prepare Test Set"):

    --layout cufed (default):
        <root>/input/NNN_0.png   "input" images
        <root>/ref/NNN_1.png     paired reference images
    --layout wrsr (the 80-pair webly-referenced benchmark naming,
    datasets/WR-SR_pairs.txt: "001.png 001_ref.png"):
        <root>/input/NNN.png
        <root>/ref/NNN_ref.png
    <root>/pairs.txt             annotation file (input ref per line)

Usage: python scripts/make_synth_dataset.py <root> [--n 8] [--size H [W]]
       [--layout cufed|wrsr]

``--size H W`` makes non-square inputs (exercises the rectangular eval
bucket path; WR-SR web images are not square).
"""
import argparse
import os

import cv2
import numpy as np


def synth_image(rng, h, w):
    """Structured random image: smooth gradients + rectangles + texture, so
    patch matching has real correspondences to find."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * (xx / w * rng.uniform(1, 3))),
        0.5 + 0.5 * np.sin(2 * np.pi * (yy / h * rng.uniform(1, 3))),
        0.5 + 0.5 * np.sin(2 * np.pi * ((xx + yy) / (h + w)
                                        * rng.uniform(1, 4))),
    ], axis=-1)
    for _ in range(6):
        x0, y0 = rng.randint(0, w - 8), rng.randint(0, h - 8)
        dw, dh = rng.randint(4, max(5, w // 3)), rng.randint(4, max(5, h // 3))
        color = rng.rand(3)
        img[y0:y0 + dh, x0:x0 + dw] = 0.6 * img[y0:y0 + dh, x0:x0 + dw] \
            + 0.4 * color
    img += rng.randn(h, w, 3) * 0.02
    return np.clip(img, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('root')
    ap.add_argument('--n', type=int, default=8)
    ap.add_argument('--size', type=int, nargs='+', default=[160],
                    help='input size: H (square) or H W')
    ap.add_argument('--ref-size', type=int, nargs='+', default=None,
                    help='reference image size (default: same as --size)')
    ap.add_argument('--layout', choices=('cufed', 'wrsr'), default='cufed',
                    help='file naming: CUFED5 (NNN_0/NNN_1) or WR-SR '
                         '(NNN/NNN_ref)')
    args = ap.parse_args()

    def hw(size):
        return (size[0], size[1] if len(size) > 1 else size[0])

    in_h, in_w = hw(args.size)
    ref_h, ref_w = hw(args.ref_size) if args.ref_size else (in_h, in_w)

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(args.root, 'input'), exist_ok=True)
    os.makedirs(os.path.join(args.root, 'ref'), exist_ok=True)

    lines = []
    for i in range(args.n):
        img = synth_image(rng, in_h, in_w)
        # ref: same content, small shift + brightness change, resized
        shift = rng.randint(2, 12)
        ref = np.roll(img, shift, axis=(0, 1)) * rng.uniform(0.9, 1.1)
        ref = np.clip(ref, 0, 1)
        if (ref_h, ref_w) != (in_h, in_w):
            ref = cv2.resize(ref, (ref_w, ref_h),
                             interpolation=cv2.INTER_CUBIC)
        if args.layout == 'wrsr':
            in_name, ref_name = f'{i + 1:03d}.png', f'{i + 1:03d}_ref.png'
        else:
            in_name, ref_name = f'{i:03d}_0.png', f'{i:03d}_1.png'
        cv2.imwrite(os.path.join(args.root, 'input', in_name),
                    (img[..., ::-1] * 255).round().astype(np.uint8))
        cv2.imwrite(os.path.join(args.root, 'ref', ref_name),
                    (ref[..., ::-1] * 255).round().astype(np.uint8))
        lines.append(f'{in_name} {ref_name}')

    with open(os.path.join(args.root, 'pairs.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {args.n} pairs under {args.root}')


if __name__ == '__main__':
    main()
