"""Datasets for the contrastive correspondence network (stages 1/2).

Parity target: mmsr/data/contras_dataset.py (image_pair_generation :13-92,
ContrasDataset :95-232, ContrasValDataset :235-376). Random crop-corner
homographies via cv2.getPerspectiveTransform; the warped image plus the
dense transformed coordinate grid are emitted for GT correspondence in the
triplet loss. Val precomputes a fixed homography pool with np seed 0.
"""
import cv2
import numpy as np

from ..utils.registry import DATASET_REGISTRY
from ..utils.util import imfrombytes
from .file_client import FileClient
from .transforms import augment, mod_crop, to_rgb_hwc
from .util import (cv2_bicubic_resize, paired_paths_from_ann_file,
                   paired_paths_from_folder, paired_paths_from_lmdb,
                   pil_chain_lq_up)


def image_pair_generation(img, random_perturb_range=(0, 32),
                          cropping_window_size=160, rng=np.random):
    """Random homography from jittered crop corners
    (contras_dataset.py:13-92). With img=None returns only H_inverse."""
    if img is not None:
        h, w = img.shape[:2]
    else:
        h = w = 160

    crop_s = cropping_window_size
    lo, hi = random_perturb_range
    x_tl = rng.randint(hi, max(w, w - crop_s - hi))
    y_tl = rng.randint(hi, max(h, h - crop_s - hi))
    rect1 = np.array(
        [(x_tl, y_tl), (x_tl + crop_s, y_tl), (x_tl + crop_s, y_tl + crop_s),
         (x_tl, y_tl + crop_s)], dtype=np.float32)

    def jitter(v):
        return v + rng.randint(lo, hi) * rng.choice([-1.0, 1.0])

    rect2 = np.array([(jitter(x), jitter(y)) for x, y in rect1],
                     dtype=np.float32)

    homography = cv2.getPerspectiveTransform(src=rect1, dst=rect2)
    h_inverse = np.linalg.inv(homography)

    if img is not None:
        img_warped = cv2.warpPerspective(src=img, M=h_inverse, dsize=(w, h))
        return img_warped, homography, h_inverse
    return h_inverse


def transformed_coordinate_grid(h_inverse, gt_h, gt_w):
    """Dense grid of H^-1-transformed homogeneous coordinates
    (contras_dataset.py:174-183). Returns (gt_h, gt_w, 3) float."""
    grid_x, grid_y = np.meshgrid(np.arange(gt_w), np.arange(gt_h))
    grid_z = np.ones(grid_x.shape)
    coordinate = np.stack((grid_x, grid_y, grid_z), axis=0).reshape(3, -1)
    transformed = h_inverse @ coordinate
    transformed = transformed / transformed[2, :]
    return transformed.T.reshape(gt_h, gt_w, 3).astype(np.float32)


class _ContrasBase:

    def __init__(self, opt):
        self.opt = opt
        self.file_client = None
        self.io_backend_opt = dict(opt['io_backend'])
        self.in_folder = opt['dataroot_in']
        self.ref_folder = opt['dataroot_ref']
        self.filename_tmpl = opt.get('filename_tmpl') or '{}'

        if self.io_backend_opt['type'] == 'lmdb':
            self.io_backend_opt['db_paths'] = [self.in_folder,
                                               self.ref_folder]
            self.io_backend_opt['client_keys'] = ['in', 'ref']
            self.paths = paired_paths_from_lmdb(
                [self.in_folder, self.ref_folder], ['in', 'ref'])
        elif opt.get('ann_file'):
            self.paths = paired_paths_from_ann_file(
                [self.in_folder, self.ref_folder], ['in', 'ref'],
                opt['ann_file'])
        else:
            self.paths = paired_paths_from_folder(
                [self.in_folder, self.ref_folder], ['in', 'ref'],
                self.filename_tmpl)

    def _ensure_client(self):
        if self.file_client is None:
            backend_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(backend_opt.pop('type'),
                                          **backend_opt)

    def _load_bgr(self, path):
        return imfrombytes(self.file_client.get(path, 'in')).astype(
            np.float32) / 255.

    def _finalize(self, img_in, img_in_transformed, h_inverse):
        gt_h, gt_w = img_in.shape[:2]
        scale = self.opt['scale']
        coords = transformed_coordinate_grid(h_inverse, gt_h, gt_w)
        _lq, img_in_up = pil_chain_lq_up(img_in, scale)
        _lq_t, img_in_transformed_up = pil_chain_lq_up(img_in_transformed,
                                                       scale)
        imgs = to_rgb_hwc([img_in, img_in_transformed, img_in_up,
                           img_in_transformed_up])
        return {
            'img_in': imgs[0],
            'img_in_up': imgs[2],
            'img_ref': imgs[1],
            'img_ref_up': imgs[3],
            'transformed_coordinate': coords,
        }

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register
class ContrasDataset(_ContrasBase):
    """Training pairs: random homography per sample
    (contras_dataset.py:95-232)."""

    def __getitem__(self, index):
        self._ensure_client()
        img_in = self._load_bgr(self.paths[index]['in_path'])
        gt_h = gt_w = self.opt['gt_size']
        img_in = cv2_bicubic_resize(img_in, (gt_w, gt_h))
        img_in = augment([img_in], self.opt['use_flip'], self.opt['use_rot'])
        img_in_transformed, _h, h_inverse = image_pair_generation(
            img_in, (0, 10), 160)
        return self._finalize(img_in, img_in_transformed, h_inverse)


@DATASET_REGISTRY.register
class ContrasValDataset(_ContrasBase):
    """Validation pairs: fixed homography pool seeded with 0
    (contras_dataset.py:290-296)."""

    def __init__(self, opt):
        super().__init__(opt)
        rng = np.random.RandomState(0)
        self.transform_matrices = [
            image_pair_generation(None, (0, 10), 160, rng=rng)
            for _ in range(len(self.paths))
        ]

    def __getitem__(self, index):
        self._ensure_client()
        img_path = self.paths[index]['in_path']
        img_in = self._load_bgr(img_path)
        img_in = mod_crop(img_in, self.opt['scale'])
        gt_h, gt_w = img_in.shape[:2]
        h_inverse = self.transform_matrices[index]
        img_in_transformed = cv2.warpPerspective(src=img_in, M=h_inverse,
                                                 dsize=(gt_w, gt_h))
        out = self._finalize(img_in, img_in_transformed, h_inverse)
        out['name'] = img_path
        return out
