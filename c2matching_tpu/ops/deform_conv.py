"""Modulated deformable convolution (DCNv2) — TPU-native.

Replaces the reference's CUDA extension (mmsr/models/archs/DCNv2/src/cuda/
dcn_v2_cuda.cu:42-172 forward, dcn_v2_im2col_cuda.cu:125-195 gather kernel)
with a pure-XLA formulation: bilinear gather at learned offsets x sigmoid
mask, then one MXU contraction with the conv weight. Being pure jnp, JAX
autodiff yields exactly the reference's analytic gradients (bilinear
coordinate weights for d/d-offset — dcn_v2_im2col_cuda.cu:82-123 — and
scatter-add for d/d-input — :197-254) with no custom VJP needed, and the op
is arbitrarily differentiable.

Layout (TPU-first, differs deliberately from the reference's NCHW):
    x:      (B, H, W, C)          NHWC
    offset: (B, Ho, Wo, G, K, 2)  per deformable group g, kernel tap k;
                                  last dim is (dy, dx)
    mask:   (B, Ho, Wo, G, K)     modulation scalars (post-sigmoid)
    weight: (K, C, Cout)          K = kh*kw taps, row-major (ky, kx)
    bias:   (Cout,)

Sampling semantics pinned to the CUDA kernel
(dcn_v2_im2col_cuda.cu:166-189): sample point
    y = ho*stride - pad + ky*dilation + offset_y
is bilinearly interpolated with zero padding; the whole tap is zero unless
y > -1 and y < H (same for x); corners outside the image contribute zero.
"""
import functools

import jax
import jax.numpy as jnp


def _bilinear_gather(x, sy, sx):
    """Bilinear sample of x:(H, W, G, Cg) at per-(position, group, tap)
    float coords sy/sx:(P, G, K). Returns (P, G, K, Cg).

    Zero-padding semantics identical to dmcn_im2col_bilinear +
    out-of-range guard (dcn_v2_im2col_cuda.cu:25-54, 180-188).
    """
    h, w, g, cg = x.shape

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
        weight = wy * wx * inb.astype(x.dtype)
        yyc = jnp.clip(yy, 0, h - 1)
        xxc = jnp.clip(xx, 0, w - 1)
        flat_idx = yyc * w + xxc  # (P, G, K)
        xf = x.reshape(h * w, g, cg)
        # gathered[p, g, k, :] = xf[flat_idx[p, g, k], g, :]
        gathered = xf[flat_idx, jnp.arange(g)[None, :, None], :]
        return gathered * weight[..., None]

    out = (corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1))
    return out * valid[..., None].astype(x.dtype)


def _mdc_single(x, offset, mask, weight, kernel_size, stride, padding,
                dilation):
    """Single-image modulated deformable conv. See module docstring shapes
    (without the leading batch dim)."""
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    kh, kw = kernel_size
    cg = c // g

    # Base sampling grid: out position (i, j), tap (ky, kx) ->
    # (i*stride - pad + ky*dil, j*stride - pad + kx*dil).
    oy = jnp.arange(ho) * stride[0] - padding[0]
    ox = jnp.arange(wo) * stride[1] - padding[1]
    ty = jnp.arange(kh) * dilation[0]
    tx = jnp.arange(kw) * dilation[1]
    base_y = (oy[:, None, None] + (ty[:, None] + jnp.zeros((kh, kw)))
              .reshape(-1)[None, None, :])       # (Ho, 1, K) via broadcast
    base_x = (ox[None, :, None] + (jnp.zeros((kh, kw)) + tx[None, :])
              .reshape(-1)[None, None, :])       # (1, Wo, K)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh * kw))
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh * kw))

    sy = base_y[:, :, None, :] + offset[..., 0]  # (Ho, Wo, G, K)
    sx = base_x[:, :, None, :] + offset[..., 1]

    p = ho * wo
    sampled = _bilinear_gather(
        x.reshape(h, w, g, cg),
        sy.reshape(p, g, k), sx.reshape(p, g, k))  # (P, G, K, Cg)
    sampled = sampled * mask.reshape(p, g, k)[..., None]

    # (P, G, K, Cg) -> (P, K, G*Cg) = (P, K, C); contract with (K, C, Cout).
    cols = sampled.transpose(0, 2, 1, 3).reshape(p, k, c)
    out = jax.lax.dot_general(
        cols.reshape(p, k * c), weight.reshape(k * c, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(ho, wo, -1)


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
