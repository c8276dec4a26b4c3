"""On-device resize ops (bilinear for network interiors).

The metric-critical PIL-bicubic degradations stay on host (see
c2matching_tpu/data/util.py) — PSNR parity hinges on PIL's exact kernel
(SURVEY.md §7 hard parts). These device-side resizes serve network
interiors only (e.g. the bilinear x4 base path of RestorationNet,
ref_restoration_arch.py:60).
"""
import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('factor', 'method'))
def upscale(x, factor=4, method='bilinear'):
    """Upsample NHWC by an integer factor.

    'bilinear' matches torch F.interpolate(..., mode='bilinear',
    align_corners=False) — half-pixel centers, which is also
    jax.image.resize's convention.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method=method)


@functools.partial(jax.jit, static_argnames=('factor',))
def nearest_up(x, factor):
    """Nearest-neighbor integer upsample of NHWC (repeat_interleave)."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def pixel_shuffle(x, factor=2):
    """Depth-to-space: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

    Channel unpacking order matches torch nn.PixelShuffle for a weight
    layout where output channel index is c*r*r + dy*r + dx.
    """
    b, h, w, crr = x.shape
    r = factor
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r(dy), w, r(dx), c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, factor=2):
    """Space-to-depth inverse of ``pixel_shuffle``."""
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)
