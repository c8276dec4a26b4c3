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
    input_path_set = set(input_paths)  # O(1) membership (11k-file CUFED)
    paths = []
    for ref_path in ref_paths:
        basename, ext = osp.splitext(osp.basename(ref_path))
        input_name = f'{filename_tmpl.format(basename)}{ext}'
        input_path = osp.join(input_folder, input_name)
        assert input_name in input_path_set, (
            f'{input_name} is not in {input_key}_paths.')
        paths.append({
            f'{input_key}_path': input_path,
            f'{ref_key}_path': osp.join(ref_folder, ref_path),
        })
    return paths


def paired_paths_from_lmdb(folders, keys):
    """lmdb-backed path pairs (mmsr/data/util.py:84-150): keys come from
    each database's meta_info.txt and must match between input and ref.
    Works identically for real lmdb databases and the in-repo fallback
    store (utils/lmdb_shim.py) — the pairing reads only meta_info.txt."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, ref_folder = folders
    input_key, ref_key = keys
    if not (input_folder.endswith('.lmdb') and ref_folder.endswith('.lmdb')):
        raise ValueError(
            f'{input_key} folder and {ref_key} folder should both in lmdb '
            f'formats. But received {input_key}: {input_folder}; '
            f'{ref_key}: {ref_folder}')
    # reference key parsing (mmsr/data/util.py:134): first token, then
    # strip the extension — keys without a '.' must not swallow the
    # shape/compression columns
    # whitespace split (not ' ') so a bare single-token line keeps no
    # trailing newline in the key
    with open(osp.join(input_folder, 'meta_info.txt')) as fin:
        input_keys = [line.split()[0].split('.')[0]
                      for line in fin if line.strip()]
    with open(osp.join(ref_folder, 'meta_info.txt')) as fin:
        ref_keys = [line.split()[0].split('.')[0]
                    for line in fin if line.strip()]
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


# ---------------------------------------------------------------------------
# MATLAB-compatible bicubic imresize (mmsr/data/util.py:332-548), numpy.
# Used by the back-projection post-processing tool (scripts/back_projection
# in the reference is MATLAB; scripts/back_projection.py here).
# ---------------------------------------------------------------------------
def _cubic_kernel(x):
    absx = np.abs(x)
    absx2 = absx ** 2
    absx3 = absx ** 3
    return ((1.5 * absx3 - 2.5 * absx2 + 1) * (absx <= 1)
            + (-0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2)
            * ((absx > 1) & (absx <= 2)))


def _matlab_weights_indices(in_length, out_length, scale, kernel_width,
                            antialiasing):
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None, :]
    distance = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic_kernel(distance * scale)
    else:
        weights = _cubic_kernel(distance)
    weights = weights / weights.sum(axis=1, keepdims=True)
    # drop all-zero boundary columns
    zero_cols = (weights == 0).sum(axis=0)
    if zero_cols[0] > out_length - 1e-6:
        indices = indices[:, 1:]
        weights = weights[:, 1:]
    if zero_cols[-1] > out_length - 1e-6:
        indices = indices[:, :-1]
        weights = weights[:, :-1]
    # symmetric-padding bookkeeping
    sym_len_s = int(-indices.min() + 1)
    sym_len_e = int(indices.max() - in_length)
    indices = (indices + sym_len_s - 1).astype(np.int64)
    return weights, indices, sym_len_s, sym_len_e


def _sym_pad(arr, axis, before, after):
    """MATLAB-style symmetric padding along one axis."""
    idx_before = np.arange(before - 1, -1, -1) if before > 0 else []
    idx_after = (np.arange(arr.shape[axis] - 1,
                           arr.shape[axis] - 1 - after, -1)
                 if after > 0 else [])
    parts = []
    if before > 0:
        parts.append(np.take(arr, idx_before, axis=axis))
    parts.append(arr)
    if after > 0:
        parts.append(np.take(arr, idx_after, axis=axis))
    return np.concatenate(parts, axis=axis)


def imresize_np(img, scale, antialiasing=True):
    """MATLAB-compatible bicubic imresize (HWC float [0,1] numpy input,
    same scale for H and W). Mirrors mmsr/data/util.py imresize_np."""
    img = np.asarray(img, dtype=np.float64)
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    in_h, in_w, c = img.shape
    out_h = int(np.ceil(in_h * scale))
    out_w = int(np.ceil(in_w * scale))
    kernel_width = 4

    w_h, i_h, s_hs, s_he = _matlab_weights_indices(in_h, out_h, scale,
                                                   kernel_width,
                                                   antialiasing)
    w_w, i_w, s_ws, s_we = _matlab_weights_indices(in_w, out_w, scale,
                                                   kernel_width,
                                                   antialiasing)

    padded = _sym_pad(img, 0, s_hs, s_he)
    # H pass: out1[o, :, :] = sum_p padded[i_h[o, p]] * w_h[o, p]
    out1 = np.einsum('opwc,op->owc', padded[i_h], w_h)
    padded2 = _sym_pad(out1, 1, s_ws, s_we)
    out2 = np.einsum('hopc,op->hoc', padded2[:, i_w], w_w)
    if squeeze:
        out2 = out2[:, :, 0]
    return out2.astype(np.float32)


# ---------------------------------------------------------------------------
# BT.601 colorspace converters (mmsr/data/util.py:250-322)
# ---------------------------------------------------------------------------
def rgb2ycbcr(img, only_y=True):
    """RGB HWC -> YCbCr, MATLAB rgb2ycbcr semantics. uint8 [0,255] or
    float [0,1] in; same type out."""
    in_img_type = img.dtype
    img = img.astype(np.float64)
    if in_img_type != np.uint8:
        img = img * 255.
    if only_y:
        rlt = np.dot(img, [65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        rlt = np.matmul(
            img, [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786],
                  [24.966, 112.0, -18.214]]) / 255.0 + [16, 128, 128]
    if in_img_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.
    return rlt.astype(in_img_type)


def ycbcr2rgb(img):
    """YCbCr HWC -> RGB, inverse of rgb2ycbcr. uint8 [0,255] or float
    [0,1] in; same type out."""
    in_img_type = img.dtype
    img = img.astype(np.float64)
    if in_img_type != np.uint8:
        img = img * 255.
    rlt = np.matmul(
        img, [[0.00456621, 0.00456621, 0.00456621],
              [0, -0.00153632, 0.00791071],
              [0.00625893, -0.00318811, 0]]) * 255.0 \
        + [-222.921, 135.576, -276.836]
    if in_img_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.
    return rlt.astype(in_img_type)
