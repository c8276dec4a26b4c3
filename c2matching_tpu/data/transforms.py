"""Host-side image transforms (numpy, HWC).

Parity target: mmsr/data/transforms.py (mod_crop :7-24, augment :89-145,
totensor :148-172). The tensor conversion differs by design: this framework
is NHWC, so ``to_rgb_hwc`` yields HWC RGB float32 numpy arrays rather than
CHW torch tensors.
"""
import random

import cv2
import numpy as np


def mod_crop(img, scale):
    """Crop an image so its spatial dims are multiples of scale."""
    img = np.copy(img)
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        h_remainder, w_remainder = h % scale, w % scale
        img = img[:h - h_remainder or None, :w - w_remainder or None, ...]
    else:
        raise ValueError(f'Wrong img ndim: {img.ndim}.')
    return img


def paired_random_crop(img_gts, img_lqs, gt_patch_size, scale):
    """Paired random crop of GT/LQ lists (transforms.py:27-86)."""
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]

    h_lq, w_lq = img_lqs[0].shape[:2]
    lq_patch_size = gt_patch_size // scale
    top = random.randint(0, h_lq - lq_patch_size)
    left = random.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...]
               for v in img_lqs]
    top_gt, left_gt = int(top * scale), int(left * scale)
    img_gts = [
        v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...]
        for v in img_gts
    ]
    if single_gt:
        img_gts = img_gts[0]
    if single_lq:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(img_list, hflip=True, rotation=True, flow_list=None):
    """Random horizontal/vertical flip + 90-degree rotation (transpose).

    All entries share the same sampled augmentation (transforms.py:89-145).
    """
    hflip = hflip and random.random() < 0.5
    vflip = rotation and random.random() < 0.5
    rot90 = rotation and random.random() < 0.5

    def _augment(img):
        if hflip:
            img = img[:, ::-1, ...].copy()
        if vflip:
            img = img[::-1, :, ...].copy()
        if rot90:
            img = img.transpose(1, 0, 2)
        return img

    def _augment_flow(flow):
        if hflip:
            flow = flow[:, ::-1, :].copy()
            flow[:, :, 0] *= -1
        if vflip:
            flow = flow[::-1, :, :].copy()
            flow[:, :, 1] *= -1
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return flow

    was_single = not isinstance(img_list, list)
    if was_single:
        img_list = [img_list]
    img_list = [_augment(img) for img in img_list]
    if len(img_list) == 1:
        img_list = img_list[0]

    if flow_list is not None:
        flow_list = [_augment_flow(flow) for flow in flow_list]
        if len(flow_list) == 1:
            flow_list = flow_list[0]
        return img_list, flow_list
    return img_list


def to_rgb_hwc(imgs, bgr2rgb=True):
    """BGR HWC float -> RGB HWC float32 numpy (NHWC framework layout)."""

    def _convert(img):
        if img.ndim == 3 and img.shape[2] == 3 and bgr2rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return np.ascontiguousarray(img, dtype=np.float32)

    if isinstance(imgs, list):
        return [_convert(img) for img in imgs]
    return _convert(imgs)
