"""Data-path utilities: paired path generation and PIL-bicubic resizing.

Parity targets: mmsr/data/util.py (paired_paths_from_ann_file :153-191,
paired_paths_from_folder :194-231, paired_paths_from_lmdb :84-150) and the
PIL-bicubic degradation chain used by every dataset
(ref_cufed_dataset.py:118-143). PIL-bicubic fidelity is metric-critical
(SURVEY.md §7) — resizes stay on host via PIL, never reimplemented.
"""
import os
import os.path as osp

import cv2
import numpy as np
from PIL import Image


def scandir(dir_path, suffix=None, recursive=False):
    """Yield relative file paths under ``dir_path`` (sorted for
    determinism)."""
    results = []
    for root, _dirs, files in os.walk(dir_path):
        for fname in files:
            rel = osp.relpath(osp.join(root, fname), dir_path)
            if suffix is None or rel.endswith(suffix):
                results.append(rel)
        if not recursive:
            break
    return sorted(results)


def paired_paths_from_ann_file(folders, keys, ann_file):
    """Paths from a whitespace-separated two-column annotation file
    (mmsr/data/util.py:153-191)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, ref_folder = folders
    input_key, ref_key = keys

    paths = []
    with open(ann_file, 'r') as fin:
        for line in fin:
            line = line.strip()
            if not line:
                continue
            input_name, ref_name = line.split()
            paths.append({
                f'{input_key}_path': osp.join(input_folder, input_name),
                f'{ref_key}_path': osp.join(ref_folder, ref_name),
            })
    return paths


def paired_paths_from_folder(folders, keys, filename_tmpl='{}'):
    """Paths from folder scans, matched by templated basename
    (mmsr/data/util.py:194-231)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, ref_folder = folders
    input_key, ref_key = keys

    input_paths = scandir(input_folder)
    ref_paths = scandir(ref_folder)
    assert len(input_paths) == len(ref_paths), (
        f'{input_key} and {ref_key} datasets have different number of '
        f'images: {len(input_paths)}, {len(ref_paths)}.')
    paths = []
    for ref_path in ref_paths:
        basename, ext = osp.splitext(osp.basename(ref_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        assert input_name in input_paths, (
            f'{input_name} is not in {input_key}_paths.')
        paths.append({
            f'{input_key}_path': input_path,
            f'{ref_key}_path': osp.join(ref_folder, ref_path),
        })
    return paths


def paired_paths_from_lmdb(folders, keys):
    """lmdb-backed path pairs (mmsr/data/util.py:84-150). The lmdb python
    package is not available in this environment; the meta_info.txt
    key-matching contract is kept so the backend can be enabled when it
    is."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, ref_folder = folders
    input_key, ref_key = keys
    if not (input_folder.endswith('.lmdb') and ref_folder.endswith('.lmdb')):
        raise ValueError(
            f'{input_key} folder and {ref_key} folder should both in lmdb '
            f'formats. But received {input_key}: {input_folder}; '
            f'{ref_key}: {ref_folder}')
    with open(osp.join(input_folder, 'meta_info.txt')) as fin:
        input_keys = [line.split('.')[0] for line in fin]
    with open(osp.join(ref_folder, 'meta_info.txt')) as fin:
        ref_keys = [line.split('.')[0] for line in fin]
    if set(input_keys) != set(ref_keys):
        raise ValueError('Keys in input_folder and ref_folder are different.')
    return [{f'{input_key}_path': k, f'{ref_key}_path': k}
            for k in sorted(input_keys)]


def pil_bicubic_resize(img_bgr, size_wh):
    """PIL-bicubic resize of a BGR float [0,1] HWC image, byte-for-byte
    matching the reference's uint8 RGB<->BGR round trip
    (ref_cufed_dataset.py:118-143). Returns BGR float32 [0, 1]."""
    arr = (img_bgr * 255).astype(np.uint8)
    pil = Image.fromarray(cv2.cvtColor(arr, cv2.COLOR_BGR2RGB))
    pil = pil.resize(size_wh, Image.BICUBIC)
    out = cv2.cvtColor(np.array(pil), cv2.COLOR_RGB2BGR)
    return out.astype(np.float32) / 255.


def pil_chain_lq_up(img_bgr, scale):
    """The reference degradation chain: PIL-bicubic down x1/scale then
    back up (ref_cufed_dataset.py:129-143). Returns (lq, up) BGR floats.

    A single uint8 round trip per image: down and up both happen in PIL
    before converting back (matching the reference, which re-ups from the
    PIL lq image, not from its uint8 re-encode)."""
    h, w = img_bgr.shape[:2]
    lq_w, lq_h = w // scale, h // scale
    arr = (img_bgr * 255).astype(np.uint8)
    pil = Image.fromarray(cv2.cvtColor(arr, cv2.COLOR_BGR2RGB))
    pil_lq = pil.resize((lq_w, lq_h), Image.BICUBIC)
    pil_up = pil_lq.resize((w, h), Image.BICUBIC)
    lq = cv2.cvtColor(np.array(pil_lq), cv2.COLOR_RGB2BGR)
    up = cv2.cvtColor(np.array(pil_up), cv2.COLOR_RGB2BGR)
    return lq.astype(np.float32) / 255., up.astype(np.float32) / 255.


def cv2_bicubic_resize(img, size_wh):
    """cv2 bicubic resize (mmcv.imresize equivalent, contras_dataset:165)."""
    return cv2.resize(img, size_wh, interpolation=cv2.INTER_CUBIC)
