#!/usr/bin/env python
"""Pack the CUFED training set into lmdb databases.

Equivalent of the reference's mmsr/scripts/create_cufed_lmdb.py: builds
input/ref lmdbs in three variants each (full, lq, up) with meta_info.txt,
using the PIL-bicubic 160->40->160 chain. Uses the ``lmdb`` package when
installed; otherwise packs into the in-repo API-compatible fallback
store (c2matching_tpu/utils/lmdb_shim.py), which LmdbBackend reads via
the same fallback. The disk backend needs no packing at all.

Usage:
  python scripts/create_cufed_lmdb.py --in_dir datasets/CUFED/input \
      --ref_dir datasets/CUFED/ref --out_root datasets/CUFED_lmdb
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np
from PIL import Image

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), osp.pardir)))


def make_variants(img_bgr_u8, gt_size=160, scale=4):
    """(full, lq, up) uint8 BGR images via the PIL chain
    (create_cufed_lmdb.py:13-273 semantics)."""
    pil = Image.fromarray(cv2.cvtColor(img_bgr_u8, cv2.COLOR_BGR2RGB))
    pil = pil.resize((gt_size, gt_size), Image.BICUBIC)
    lq = pil.resize((gt_size // scale, gt_size // scale), Image.BICUBIC)
    up = lq.resize((gt_size, gt_size), Image.BICUBIC)
    to_bgr = lambda p: cv2.cvtColor(np.array(p), cv2.COLOR_RGB2BGR)  # noqa
    return to_bgr(pil), to_bgr(lq), to_bgr(up)


def pack(folder, out_root, name, gt_size, scale):
    try:
        import lmdb
    except ImportError:
        from c2matching_tpu.utils import lmdb_shim as lmdb
        print('lmdb package not available; packing into the in-repo '
              'fallback store format (readable by LmdbBackend via the '
              'same fallback)')

    files = sorted(f for f in os.listdir(folder)
                   if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    variants = {'': [], '_lq': [], '_up': []}
    for suffix in variants:
        path = osp.join(out_root, f'{name}{suffix}.lmdb')
        os.makedirs(path, exist_ok=True)
        env = lmdb.open(path, map_size=1099511627776)
        meta = []
        with env.begin(write=True) as txn:
            for fname in files:
                img = cv2.imread(osp.join(folder, fname), cv2.IMREAD_COLOR)
                full, lq, up = make_variants(img, gt_size, scale)
                sel = {'': full, '_lq': lq, '_up': up}[suffix]
                key = osp.splitext(fname)[0]
                ok, buf = cv2.imencode('.png', sel)
                assert ok
                txn.put(key.encode('ascii'), buf.tobytes())
                h, w = sel.shape[:2]
                meta.append(f'{key}.png ({h},{w},3) 1')
        env.close()
        with open(osp.join(path, 'meta_info.txt'), 'w') as f:
            f.write('\n'.join(meta) + '\n')
        print(f'packed {len(files)} images -> {path}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--in_dir', required=True)
    ap.add_argument('--ref_dir', required=True)
    ap.add_argument('--out_root', required=True)
    ap.add_argument('--gt_size', type=int, default=160)
    ap.add_argument('--scale', type=int, default=4)
    args = ap.parse_args()
    pack(args.in_dir, args.out_root, 'input', args.gt_size, args.scale)
    pack(args.ref_dir, args.out_root, 'ref', args.gt_size, args.scale)


if __name__ == '__main__':
    main()
