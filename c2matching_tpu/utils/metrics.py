"""Evaluation metrics: PSNR, MATLAB-compatible SSIM, BT.601 Y conversion.

Parity target: mmsr/utils/metrics.py (psnr :34-66, ssim :69-143,
bgr2ycbcr :146-168). Host-side numpy — metrics are computed on CPU on the
final uint8 images exactly as the reference does, because the published
protocol (BASELINE.md) is defined in terms of these implementations.
"""
import cv2
import numpy as np


def reorder_image(img, input_order='HWC'):
    """Return image as HWC (2D images get a trailing singleton channel)."""
    if input_order not in ('HWC', 'CHW'):
        raise ValueError(f'Wrong input_order {input_order}')
    if img.ndim == 2:
        return img[..., None]
    if input_order == 'CHW':
        return img.transpose(1, 2, 0)
    return img


def psnr(img1, img2, crop_border=0, input_order='HWC'):
    """PSNR over [0, 255] images, with border cropping."""
    assert img1.shape == img2.shape, (
        f'Image shapes differ: {img1.shape} vs {img2.shape}')
    img1 = reorder_image(img1, input_order).astype(np.float64)
    img2 = reorder_image(img2, input_order).astype(np.float64)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    mse = np.mean((img1 - img2)**2)
    if mse == 0:
        return float('inf')
    return 20. * np.log10(255. / np.sqrt(mse))


def _ssim_single(img1, img2):
    """SSIM for one channel, MATLAB-window protocol (11x11 gaussian, 1.5)."""
    c1 = (0.01 * 255)**2
    c2 = (0.03 * 255)**2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)

    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def ssim(img1, img2, crop_border=0, input_order='HWC'):
    """Channel-averaged MATLAB-compatible SSIM over [0, 255] images."""
    assert img1.shape == img2.shape, (
        f'Image shapes differ: {img1.shape} vs {img2.shape}')
    img1 = reorder_image(img1, input_order)
    img2 = reorder_image(img2, input_order)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    return np.mean(
        [_ssim_single(img1[..., i], img2[..., i])
         for i in range(img1.shape[2])])


def bgr2ycbcr(img, only_y=True):
    """BT.601 BGR->YCbCr, matching MATLAB rgb2ycbcr on BGR-ordered input.

    uint8 input in [0, 255] -> rounded uint8 output; float input in [0, 1]
    -> float output in [0, 1].
    """
    in_img_type = img.dtype
    img = img.astype(np.float64)
    if in_img_type != np.uint8:
        img = img * 255.
    if only_y:
        rlt = np.dot(img, [24.966, 128.553, 65.481]) / 255.0 + 16.0
    else:
        rlt = np.matmul(
            img, [[24.966, 112.0, -18.214], [128.553, -74.203, -93.786],
                  [65.481, -37.797, 112.0]]) / 255.0 + [16, 128, 128]
    if in_img_type == np.uint8:
        rlt = rlt.round()
    else:
        rlt = rlt / 255.
    return rlt.astype(in_img_type)
