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


def _axis_resize(x, axis, out_n, valid_n=None):
    """1-D bilinear resample along ``axis`` to an arbitrary size with
    half-pixel centers (torch F.interpolate align_corners=False; NO
    antialiasing even when downscaling — torch's bilinear does not
    antialias, unlike jax.image.resize), written as two gathers + lerp.

    jax.image.resize lowers to a kernel-2/stride-1 window convolution
    that trips the TPU fusion emitter's bounds==strides check when fused
    into a larger program — this formulation avoids window ops entirely.

    ``valid_n`` (int or traced scalar): when ``x`` is bucket-padded along
    ``axis``, the index of the last REAL sample is valid_n-1; clamping
    the source coordinate there reproduces the exact-shape run's border
    clamp on the valid output range (outputs past it are pad-band and
    masked/cropped by the caller). The output length stays ``out_n``.
    """
    n = x.shape[axis]
    scale = n / out_n
    coords = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
    # clamp the SOURCE COORDINATE (not just the index): torch clamps
    # out-of-range half-pixel centers to the border sample, so the
    # fraction must be recomputed after clamping (coords < 0 -> x[0]
    # exactly, not a lerp toward x[1]).
    if valid_n is None:
        hi = float(n - 1)
        hi_i = n - 1
    else:
        hi_i = jnp.minimum(jnp.asarray(valid_n, jnp.int32), n) - 1
        hi = hi_i.astype(jnp.float32)
    coords = jnp.clip(coords, 0.0, hi)
    i0f = jnp.floor(coords)
    frac = coords - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, hi_i)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_n
    frac = frac.reshape(shape).astype(x.dtype)
    return x0 * (1.0 - frac) + x1 * frac


def _axis_lerp(x, axis, factor, valid_n=None):
    """Integer-factor upsample = the exact special case
    ``_axis_resize(x, axis, n*factor)`` (one border-semantics
    implementation to maintain, not two)."""
    return _axis_resize(x, axis, x.shape[axis] * factor, valid_n=valid_n)


@functools.partial(jax.jit, static_argnames=('out_h', 'out_w'))
def bilinear_resize(x, out_h, out_w):
    """NHWC bilinear resample to (out_h, out_w), torch
    F.interpolate(mode='bilinear', align_corners=False) semantics for
    any scale (up or down), separable H then W."""
    return _axis_resize(_axis_resize(x, 1, out_h), 2, out_w)


@functools.partial(jax.jit, static_argnames=('factor', 'method'))
def upscale(x, factor=4, method='bilinear', valid_shape=None):
    """Upsample NHWC by an integer factor.

    'bilinear' matches torch F.interpolate(..., mode='bilinear',
    align_corners=False) — half-pixel centers, separable along H then W.

    ``valid_shape`` (vh, vw): bucket-padded input — border-clamp at the
    last REAL row/col so valid outputs equal the exact-shape run's (the
    exact run clamps its final half-pixel centers to ITS border, which
    is interior here; see _axis_resize).
    """
    if method == 'nearest':
        assert valid_shape is None
        return nearest_up(x, factor)
    assert method == 'bilinear', method
    vh, vw = valid_shape if valid_shape is not None else (None, None)
    return _axis_lerp(_axis_lerp(x, 1, factor, valid_n=vh), 2, factor,
                      valid_n=vw)


@functools.partial(jax.jit, static_argnames=('factor',))
def nearest_up(x, factor):
    """Nearest-neighbor integer upsample of NHWC (repeat_interleave).

    broadcast+reshape instead of jnp.repeat — see
    flow.upsample_flow for the TPU fusion rationale."""
    b, h, w, c = x.shape
    f = factor
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, f, w, f, c))
    return up.reshape(b, h * f, w * f, c)


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
