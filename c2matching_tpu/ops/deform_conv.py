"""Modulated deformable convolution (DCNv2) — TPU-native.

Replaces the reference's CUDA extension (mmsr/models/archs/DCNv2/src/cuda/
dcn_v2_cuda.cu:42-172 forward, dcn_v2_im2col_cuda.cu:125-195 gather kernel)
with a pure-XLA formulation: bilinear gather at learned offsets x sigmoid
mask, then MXU contractions with the conv weight. Being pure jnp, JAX
autodiff yields exactly the reference's analytic gradients (bilinear
coordinate weights for d/d-offset — dcn_v2_im2col_cuda.cu:82-123 — and
scatter-add for d/d-input — :197-254) with no custom VJP needed, and the op
is arbitrarily differentiable.

Layout (TPU-first, deliberately different from the reference's NCHW):
    x:      (B, H, W, C)          NHWC
    offset: (B, Ho, Wo, G, K, 2)  per deformable group g, kernel tap k;
                                  last dim is (dy, dx)
    mask:   (B, Ho, Wo, G, K)     modulation scalars (post-sigmoid)
    weight: (K, C, Cout)          K = kh*kw taps, row-major (ky, kx)
    bias:   (Cout,)

TPU shape discipline: all large intermediates keep either the pixel count
P = Ho*Wo or the channel count C in the trailing (lane) dimension —
(P, G, K)-trailing layouts tile-pad 14x on TPU and OOM HBM. The K taps are
processed with a lax.scan accumulating (P, Cout), so peak temp memory is
one (G, P, Cg) gather per corner.

Sampling semantics pinned to the CUDA kernel
(dcn_v2_im2col_cuda.cu:166-189): sample point
    y = ho*stride - pad + ky*dilation + offset_y
is bilinearly interpolated with zero padding; the whole tap is zero unless
y > -1 and y < H (same for x); corners outside the image contribute zero.
"""
import functools

import jax
import jax.numpy as jnp


def _bilinear_gather_tap(xf, sy, sx, h, w):
    """Bilinear sample for one kernel tap.

    Args:
        xf: (G, H*W, Cg) per-group flattened feature.
        sy, sx: (G, P) float sample coords.
    Returns:
        (G, P, Cg) samples with zero padding semantics.
    """
    valid = (sy > -1.0) & (sy < h) & (sx > -1.0) & (sx < w)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(dy, dx):
        yy = y0i + dy
        xx = x0i + dx
        wy = jnp.where(dy == 0, 1.0 - fy, fy)
        wx = jnp.where(dx == 0, 1.0 - fx, fx)
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        weight = wy * wx * inb.astype(xf.dtype)          # (G, P)
        flat = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        # per-group row gather: (G, H*W, Cg)[g, flat[g, p]] -> (G, P, Cg)
        gathered = jnp.take_along_axis(xf, flat[:, :, None], axis=1)
        return gathered * weight[:, :, None]

    out = corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)
    return out * valid[:, :, None].astype(xf.dtype)


def _mdc_single(x, offset, mask, weight, kernel_size, stride, padding,
                dilation):
    """Single-image modulated deformable conv (see module docstring,
    shapes without the leading batch dim)."""
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    kh, kw = kernel_size
    cg = c // g
    p = ho * wo
    cout = weight.shape[-1]

    # Base sampling grid per tap: (K, P).
    oy = jnp.arange(ho, dtype=x.dtype) * stride[0] - padding[0]
    ox = jnp.arange(wo, dtype=x.dtype) * stride[1] - padding[1]
    base = (oy[:, None] + jnp.zeros((ho, wo), x.dtype),
            ox[None, :] + jnp.zeros((ho, wo), x.dtype))
    ky = (jnp.arange(kh, dtype=x.dtype)[:, None] *
          dilation[0]).repeat(kw, 1).reshape(-1)          # (K,)
    kx = (jnp.arange(kw, dtype=x.dtype)[None, :] *
          dilation[1]).repeat(kh, 0).reshape(-1)          # (K,)

    # offsets to (K, G, P) — large P stays in the lane dim.
    off_y = offset[..., 0].reshape(p, g, k).transpose(2, 1, 0)
    off_x = offset[..., 1].reshape(p, g, k).transpose(2, 1, 0)
    sy = base[0].reshape(p)[None, None, :] + ky[:, None, None] + off_y
    sx = base[1].reshape(p)[None, None, :] + kx[:, None, None] + off_x
    mask_kgp = mask.reshape(p, g, k).transpose(2, 1, 0)

    xf = x.reshape(h * w, g, cg).transpose(1, 0, 2)       # (G, H*W, Cg)

    def tap_body(acc, tap):
        sy_k, sx_k, m_k, w_k = tap      # (G,P) (G,P) (G,P) (C,Cout)
        vals = _bilinear_gather_tap(xf, sy_k, sx_k, h, w)  # (G, P, Cg)
        vals = vals * m_k[:, :, None]
        cols = vals.transpose(1, 0, 2).reshape(p, c)
        acc = acc + jnp.dot(cols, w_k,
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((p, cout), jnp.float32)
    out, _ = jax.lax.scan(tap_body, acc0, (sy, sx, mask_kgp, weight))
    return out.reshape(ho, wo, cout)


@functools.partial(
    jax.jit,
    static_argnames=('kernel_size', 'stride', 'padding', 'dilation'))
def modulated_deform_conv(x, offset, mask, weight, bias=None,
                          kernel_size=(3, 3), stride=(1, 1), padding=(1, 1),
                          dilation=(1, 1)):
    """Batched modulated deformable convolution (DCNv2 forward).

    Args:
        x:      (B, H, W, C) input feature (the ref VGG feature to warp).
        offset: (B, Ho, Wo, G, K, 2) sampling offsets, last dim (dy, dx).
        mask:   (B, Ho, Wo, G, K) modulation (already sigmoid-ed).
        weight: (K, C, Cout) taps in row-major (ky, kx) order.
        bias:   (Cout,) or None.

    Returns:
        (B, Ho, Wo, Cout) float32.
    """
    fn = functools.partial(
        _mdc_single, kernel_size=kernel_size, stride=stride, padding=padding,
        dilation=dilation)
    out = jax.vmap(fn, in_axes=(0, 0, 0, None))(x, offset, mask, weight)
    if bias is not None:
        out = out + bias
    return out


def torch_weight_to_kco(w_oihw):
    """Convert a torch DCN weight (Cout, Cin, kh, kw) ndarray to our
    (K, Cin, Cout) layout."""
    cout, cin, kh, kw = w_oihw.shape
    return jnp.asarray(w_oihw).transpose(2, 3, 1, 0).reshape(kh * kw, cin,
                                                             cout)
