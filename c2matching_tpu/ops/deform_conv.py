"""Modulated deformable convolution (DCNv2) — TPU-native.

Replaces the reference's CUDA extension (mmsr/models/archs/DCNv2/src/cuda/
dcn_v2_cuda.cu:42-172 forward, dcn_v2_im2col_cuda.cu:125-195 gather kernel)
with pure-XLA formulations: bilinear gather at learned offsets x sigmoid
mask, then MXU contractions with the conv weight. Being pure jnp, JAX
autodiff yields exactly the reference's analytic gradients (bilinear
coordinate weights for d/d-offset — dcn_v2_im2col_cuda.cu:82-123 — and
scatter-add for d/d-input — :197-254) with no custom VJP needed, and the
op is arbitrarily differentiable.

Two implementations, same semantics:

- ``modulated_deform_conv`` (production): conv-packed corners + group
  scan. TPU gather throughput is bound by PADDED output bytes (minor
  dims pad to 128 lanes), so (1) the 4 bilinear corners of each sample
  are packed into single gather rows of a zero-ring-padded operand (4x
  fewer rows; packing itself is a 2x2 0/1-kernel convolution on the
  MXU), (2) the scan runs over deformable groups so each step's gather
  operand stays small, (3) all index/factor prep keeps P in the minor
  dim (tiny minor dims tile-pad up to 14x), and (4) batching is a
  lax.scan over images — a vmapped gather falls off the TPU fast path
  even at batch 1. Corner weights are expanded to per-column factors
  with constant 0/1 expansion matmuls and the corner-sum is folded into
  a row-replicated weight matmul. Measured at CUFED5-scale relu1
  (512x336x64, G=8) on one v5e chip: 85 ms (vs 121 ms for the round-1
  slice/concat/vmap version and 360 ms for the naive formulation);
  batch-4: 269 ms vs 783 ms.

- ``modulated_deform_conv_reference``: straightforward per-tap gather
  formulation; the oracle-tested ground truth (kept for tests and
  readability).

Layout (TPU-first, deliberately different from the reference's NCHW):
    x:      (B, H, W, C)          NHWC
    offset: (B, Ho, Wo, G, K, 2)  per deformable group g, kernel tap k;
                                  last dim is (dy, dx)
    mask:   (B, Ho, Wo, G, K)     modulation scalars (post-sigmoid)
    weight: (K, C, Cout)          K = kh*kw taps, row-major (ky, kx)
    bias:   (Cout,)

Measured gather cost model (v5e, round 2; timings below are net of the
~36 ms tunnel fetch round-trip this environment adds to every forced
measurement): the row gather is ROW-RATE bound at ~280M rows/s, not
padded-byte bound — bitcasting the operand to int8 so rows occupy
exactly 128 lanes (f32: 512B padded -> 128B) moves f32 only ~59 -> ~48
ms at relu1 eval scale (12.4M rows) and bf16 not at all (~44 -> ~44).
bf16's gain over f32 comes from the smaller operand, not output bytes.
(Wiring that int8 view into the real op was tried and REVERTED: the
isolated microbench sums the int8 rows directly, but the production op
must bitcast the gathered rows back — the (P*K, width, 4) minor-dim-4
relayout costs far more than the gather saves, 97 -> 137 ms at relu1.)
With rows = G*K*P irreducible under exact DCN semantics (every
(group, tap, pixel) has an independent coordinate) and the 4 bilinear
corners already packed into one row each, ~80 ms is the XLA-gather floor
at relu1 scale; the only formulation measured below it is the candidate-
block windowed op (ops/dcn_window.py, ~64 ms ceiling) which OOMs at full
relu1 scale. Do not re-try lane packing.

Sampling semantics pinned to the CUDA kernel
(dcn_v2_im2col_cuda.cu:166-189): sample point
    y = ho*stride - pad + ky*dilation + offset_y
is bilinearly interpolated with zero padding; the whole tap is zero unless
y > -1 and y < H (same for x); corners outside the image contribute zero.
Only the 3x3/stride-1/pad-1/dilation-1 configuration used by the model
family takes the fast path; other configs fall back to the reference
implementation.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


# --------------------------------------------------------------------------
# reference implementation (oracle)
# --------------------------------------------------------------------------
def _bilinear_gather_tap(xf, sy, sx, h, w):
    """Bilinear sample for one kernel tap.

    xf: (G, H*W, Cg); sy, sx: (G, P). Returns (G, P, Cg), zero-padded
    semantics."""
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
        weight = wy * wx * inb.astype(xf.dtype)
        flat = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        gathered = jnp.take_along_axis(xf, flat[:, :, None], axis=1)
        return gathered * weight[:, :, None]

    out = corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)
    return out * valid[:, :, None].astype(xf.dtype)


def _base_grid(ho, wo, kh, kw, stride, padding, dilation):
    """Base sampling coords: (P,) per-pixel and (K,) per-tap offsets."""
    oy = jnp.arange(ho, dtype=jnp.float32) * stride[0] - padding[0]
    ox = jnp.arange(wo, dtype=jnp.float32) * stride[1] - padding[1]
    # broadcast+reshape, not .repeat (repo-wide rule: jnp.repeat lowers
    # to window ops the TPU fusion emitter can SIGABRT on; these are
    # tiny trace-time constants, but keep the package consistent)
    ky = jnp.broadcast_to(jnp.arange(kh, dtype=jnp.float32)[:, None]
                          * dilation[0], (kh, kw)).reshape(-1)
    kx = jnp.broadcast_to(jnp.arange(kw, dtype=jnp.float32)[None, :]
                          * dilation[1], (kh, kw)).reshape(-1)
    base_y = (oy[:, None] + jnp.zeros((ho, wo), jnp.float32)).reshape(-1)
    base_x = (ox[None, :] + jnp.zeros((ho, wo), jnp.float32)).reshape(-1)
    return base_y, base_x, ky, kx


def _mdc_reference_single(x, offset, mask, weight, kernel_size, stride,
                          padding, dilation):
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    kh, kw = kernel_size
    cg = c // g
    p = ho * wo

    base_y, base_x, ky, kx = _base_grid(ho, wo, kh, kw, stride, padding,
                                        dilation)
    off_y = offset[..., 0].reshape(p, g, k).transpose(2, 1, 0)
    off_x = offset[..., 1].reshape(p, g, k).transpose(2, 1, 0)
    sy = base_y[None, None, :] + ky[:, None, None] + off_y
    sx = base_x[None, None, :] + kx[:, None, None] + off_x
    mask_kgp = mask.reshape(p, g, k).transpose(2, 1, 0)

    xf = x.reshape(h * w, g, cg).transpose(1, 0, 2)

    def tap_body(acc, tap):
        sy_k, sx_k, m_k, w_k = tap
        vals = _bilinear_gather_tap(xf, sy_k, sx_k, h, w)
        vals = vals * m_k[:, :, None]
        cols = vals.transpose(1, 0, 2).reshape(p, c)
        acc = acc + jnp.dot(cols, w_k,
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((p, weight.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(tap_body, acc0, (sy, sx, mask_kgp, weight))
    return out.reshape(ho, wo, -1)


@functools.partial(
    jax.jit,
    static_argnames=('kernel_size', 'stride', 'padding', 'dilation'))
def modulated_deform_conv_reference(x, offset, mask, weight, bias=None,
                                    kernel_size=(3, 3), stride=(1, 1),
                                    padding=(1, 1), dilation=(1, 1)):
    """Oracle-tested straightforward formulation (see module docstring)."""
    fn = functools.partial(
        _mdc_reference_single, kernel_size=kernel_size, stride=stride,
        padding=padding, dilation=dilation)
    out = jax.vmap(fn, in_axes=(0, 0, 0, None))(x, offset, mask, weight)
    if bias is not None:
        out = out + bias
    return out


# --------------------------------------------------------------------------
# production implementation: conv-packed corners + group-scan gather
# --------------------------------------------------------------------------
def _pack_corner_kernel(g, cg):
    """(2, 2, C, 4*C) 0/1 conv kernel realizing the corner packing:
    out channel g*4cg + corner*cg + cc <- in channel g*cg + cc at conv
    tap (dy, dx), corner = dy*2 + dx.

    Expressing the pack as a 2x2 convolution keeps it on the MXU; the
    equivalent slice+concat+transpose chain costs ~25 ms at relu1 eval
    scale because the x-shifted lane interleave defeats XLA's tiling."""
    c = g * cg
    kern = np.zeros((2, 2, c, 4 * c), np.float32)
    for dy in range(2):
        for dx in range(2):
            corner = dy * 2 + dx
            for gi in range(g):
                for cc in range(cg):
                    kern[dy, dx, gi * cg + cc,
                         gi * 4 * cg + corner * cg + cc] = 1.0
    return jnp.asarray(kern)


def use_group_scan(h, w, c, dtype):
    """Whether _mdc_fast_single should scan over deformable groups for
    an (h, w, c) input: True when the corner-packed operand exceeds
    40 MB (shared by the windowed variant so the fallback heuristics
    cannot drift apart).

    Threshold re-checked round 2 with bf16 operands: isolated,
    relu2-bf16 (44.5 MB) is ~2 ms faster un-scanned, but END-TO-END the
    un-scanned variant regresses the serving bench 9.83 -> 9.49 img/s
    (the larger per-step working set hurts overlap inside the batch
    image-scan) — keep 40 MB. Sized from the PACKED buffer's dtype
    (f32 unless the input is bf16 — see _mdc_fast_single), not the raw
    input's."""
    dt_size = 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4
    packed_bytes = (h + 1) * (w + 1) * 4 * c * dt_size
    return packed_bytes > 40 * 1024 * 1024


def _mdc_fast_single(x, offset, mask, weight, group_scan=True):
    """3x3/stride-1/pad-1 fast path; see module docstring for the design.

    All index/factor prep runs in (G, K, P) layouts (P minor): arrays
    with a tiny minor dim ((P, G, 9)-style slices) tile-pad up to 14x on
    TPU and used to dominate the op. The single layout change is one
    (P, G*K*2) -> (G*K*2, P) transpose of the offsets.

    group_scan=True scans over deformable groups (small per-step gather
    operand — right for large images). group_scan=False does one gather
    over all groups (right for small images, where the whole-image
    operand already fits the gather fast path).

    Precision: the op computes in ``x.dtype`` (f32 default). Passing x
    as bfloat16 halves the gathered bytes — the gather is byte-bound at
    ~28 GB/s of gathered output on TPU regardless of row width or index
    count, and dominates the op — and runs the corner/weight matmuls on
    the bf16 MXU path. Sampling COORDINATES stay float32 throughout, and
    the bilinear factors / masks are computed in f32 from those f32
    coordinates; in bf16 mode the factors are then rounded to bf16 for
    the row multiply, so the gathered feature values, the factor
    multiply, and the weight contraction all round to bf16 (~0.4%%
    relative). Accumulation is f32 and the result is returned as f32."""
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    cg = c // g
    p = ho * wo
    co = weight.shape[-1]
    h1, w1 = h + 1, w + 1
    dt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    # corner packing: packed[y*(W+1)+x, g, :] = [c00|c01|c10|c11] of
    # group g at (y-1, x-1) in original coords, zero ring at the border.
    # HIGHEST precision: a 0/1 kernel contraction must move the values
    # losslessly (default TPU dot truncates inputs to bf16; with bf16
    # values a 0/1 contraction is itself exact).
    xp = jnp.pad(x.astype(dt), ((1, 1), (1, 1), (0, 0)))
    packed = jax.lax.conv_general_dilated(
        xp[None], _pack_corner_kernel(g, cg).astype(dt),
        window_strides=(1, 1),
        padding='VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=jax.lax.Precision.HIGHEST)[0]
    packed = packed.reshape(h1 * w1, g, 4 * cg)

    base_y, base_x, ky, kx = _base_grid(ho, wo, 3, 3, (1, 1), (1, 1),
                                        (1, 1))
    # sampling coordinates are ALWAYS f32: bf16 coords on a 512-wide
    # feature map would be off by up to ~2px.
    offt = (offset.astype(jnp.float32)
            .reshape(p, g * k * 2).T.reshape(g, k, 2, p))
    off_y = offt[:, :, 0, :]
    off_x = offt[:, :, 1, :]
    sy = base_y[None, None, :] + ky[None, :, None] + off_y   # (G, K, P)
    sx = base_x[None, None, :] + kx[None, :, None] + off_x
    mt = mask.astype(jnp.float32).reshape(p, g * k).T.reshape(g, k, p)

    valid = (sy > -1.) & (sy < h) & (sx > -1.) & (sx < w)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    ys = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    xs = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    flat = (ys * w1 + xs).transpose(0, 2, 1).reshape(g, p * k)

    mm = mt * valid.astype(jnp.float32)
    ws = jnp.stack([(1 - fy) * (1 - fx) * mm, (1 - fy) * fx * mm,
                    fy * (1 - fx) * mm, fy * fx * mm],
                   axis=2).reshape(g, k * 4, p)       # [k][corner], P minor

    # factor expansion: (K*4, K*4*Cg) constant 0/1, E[i, i*Cg+j] = 1
    eye = jnp.eye(k * 4, dtype=jnp.float32)
    expand = jnp.broadcast_to(eye[:, :, None],
                              (k * 4, k * 4, cg)).reshape(k * 4,
                                                          k * 4 * cg)

    # per-group weight with rows replicated per corner:
    # w4[g, (k*4+corner)*Cg + j] = weight[k, g*Cg + j]
    w4 = weight.astype(dt).reshape(k, g, cg, co).transpose(1, 0, 2, 3)
    w4 = jnp.broadcast_to(w4[:, :, None, :, :], (g, k, 4, cg, co))
    w4 = w4.reshape(g, k * 4 * cg, co)

    def group_step(acc, args):
        gi, flat_g, ws_g, w4_g = args
        packed_g = jax.lax.dynamic_slice_in_dim(packed, gi, 1,
                                                axis=1)[:, 0]
        rows = jnp.take(packed_g, flat_g, axis=0)     # (P*K, 4Cg)
        rows = rows.reshape(p, k * 4 * cg)            # [k][corner][cg]
        rows = checkpoint_name(rows, 'dcn_rows')
        factor = jnp.dot(ws_g.T, expand,
                         preferred_element_type=jnp.float32).astype(dt)
        acc = acc + jnp.dot(rows * factor, w4_g,
                            preferred_element_type=jnp.float32)
        return acc, None

    if group_scan:
        acc0 = jnp.zeros((p, co), jnp.float32)
        out, _ = jax.lax.scan(group_step, acc0,
                              (jnp.arange(g), flat, ws, w4))
        return out.reshape(ho, wo, co)

    # single gather over all groups: fold g into the row index
    hw1 = h1 * w1
    packed_all = packed.reshape(hw1 * g, 4 * cg)
    flat_all = flat * g + jnp.arange(g, dtype=jnp.int32)[:, None]
    rows = jnp.take(packed_all, flat_all.reshape(-1), axis=0)
    # rows are [g][p][k][4Cg]; process per group with plain matmuls
    rows = checkpoint_name(rows.reshape(g, p, k * 4 * cg), 'dcn_rows')
    factor = jnp.einsum('gep,ec->gpc', ws, expand,
                        preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum('gpc,gco->po', rows * factor, w4,
                     preferred_element_type=jnp.float32)
    return out.reshape(ho, wo, co)


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
    if (kernel_size, stride, padding, dilation) != ((3, 3), (1, 1), (1, 1),
                                                    (1, 1)):
        return modulated_deform_conv_reference(
            x, offset, mask, weight, bias, kernel_size, stride, padding,
            dilation)

    b, h, w, c = x.shape
    # Batching is ALWAYS a lax.scan over images: a vmapped gather falls
    # off the TPU fast path even at batch 1 (measured +32 ms at relu1
    # eval scale, and batch-4 eval 783 -> 269 ms after the switch).
    # Within an image, scan over deformable groups when the packed
    # operand is large (eval shapes) and do one all-groups gather when
    # it is small (training shapes).
    group_scan = use_group_scan(h, w, c, x.dtype)
    if b == 1:
        out = _mdc_fast_single(x[0], offset[0], mask[0], weight,
                               group_scan=group_scan)[None]
    else:
        def batch_step(_, args):
            xi, oi, mi = args
            return None, _mdc_fast_single(xi, oi, mi, weight,
                                          group_scan=group_scan)

        _, out = jax.lax.scan(batch_step, None, (x, offset, mask))
    if bias is not None:
        out = out + bias
    return out


@functools.partial(
    jax.jit,
    static_argnames=('kernel_size', 'stride', 'padding', 'dilation'))
def deform_conv(x, offset, weight, bias=None, kernel_size=(3, 3),
                stride=(1, 1), padding=(1, 1), dilation=(1, 1)):
    """Unmodulated deformable convolution (DCNv1) — the vestigial
    mmdet-style extension's forward (mmsr/models/archs/dcn/
    deform_conv_cuda.cpp:151): DCNv2 with mask == 1."""
    mask = jnp.ones(offset.shape[:-1], x.dtype)
    return modulated_deform_conv(x, offset, mask, weight, bias, kernel_size,
                                 stride, padding, dilation)


def deform_psroi_pooling(x, rois, offsets, output_dim, group_size,
                         pooled_size, spatial_scale=1.0, trans_std=0.0,
                         no_trans=False, sample_per_part=4,
                         part_size=None):
    """Deformable position-sensitive ROI pooling — faithful to
    DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu:59-148 (Python wrapper
    dcn_v2.py:256-411): rounded ROI corners ([round(x1)*ss-0.5,
    (round(x2)+1)*ss-0.5)), bins forced to >=0.1, a sample_per_part x
    sample_per_part sub-bin grid averaged over the IN-BOUNDS samples
    (w in [-0.5, W-0.5], clamped to [0, W-1] before floor/ceil bilinear),
    and per-PART per-CLASS learned offsets (part index floor(p/ps*part),
    class = ctop // (output_dim/num_classes)). Unused by any C2-Matching
    workload (detection legacy) — provided for extension-API parity;
    oracle-tested against a numpy transcription of the CUDA kernel.

    Args:
        x: (H, W, C) position-sensitive score maps,
           C = output_dim * group_size^2, channel flattened in the CUDA
           order c = (ctop * gs + gh) * gs + gw (:139).
        rois: (N, 5) [batch_idx, x1, y1, x2, y2] in input coords (the
           batch_idx is ignored for this single-image form).
        offsets: (N, num_classes, 2, part_size, part_size) normalized
           part offsets ((x, y) channel order, :108-109), or None.
    Returns:
        (N, pooled_size, pooled_size, output_dim)
    """
    h, w, _ = x.shape
    ps = pooled_size
    gs = group_size
    part = pooled_size if part_size is None else part_size
    spp = sample_per_part
    fps = jnp.arange(ps, dtype=jnp.float32)

    # position-sensitive indices, shared by all ROIs
    gw_of = jnp.clip(jnp.floor(fps * gs / ps).astype(jnp.int32), 0, gs - 1)
    gh_of = gw_of
    part_of = jnp.floor(fps / ps * part).astype(jnp.int32)  # (ps,)

    xg = x.reshape(h, w, output_dim, gs, gs)

    def pool_one(roi, off):
        roi_start_w = jnp.round(roi[1]) * spatial_scale - 0.5
        roi_start_h = jnp.round(roi[2]) * spatial_scale - 0.5
        roi_end_w = (jnp.round(roi[3]) + 1.) * spatial_scale - 0.5
        roi_end_h = (jnp.round(roi[4]) + 1.) * spatial_scale - 0.5
        roi_w = jnp.maximum(roi_end_w - roi_start_w, 0.1)
        roi_h = jnp.maximum(roi_end_h - roi_start_h, 0.1)
        bin_w = roi_w / ps
        bin_h = roi_h / ps
        sub_w = bin_w / spp
        sub_h = bin_h / spp

        if no_trans or off is None:
            tx = jnp.zeros((output_dim, ps, ps))
            ty = jnp.zeros((output_dim, ps, ps))
        else:
            num_classes = off.shape[0]
            class_of = (jnp.arange(output_dim)
                        // max(output_dim // num_classes, 1))
            # off[class, {x=0, y=1}, part_h, part_w] * trans_std
            tx_c = off[:, 0][:, part_of][:, :, part_of] * trans_std
            ty_c = off[:, 1][:, part_of][:, :, part_of] * trans_std
            tx = tx_c[class_of]                       # (od, ps, ps)
            ty = ty_c[class_of]

        # sub-bin sample coords: (od, ph, pw, ih, iw)
        wstart = (fps[None, None, :] * bin_w + roi_start_w
                  + tx * roi_w)                        # (od, ps, ps)
        hstart = (fps[None, :, None] * bin_h + roi_start_h
                  + ty * roi_h)
        sw = (wstart[..., None, None]
              + jnp.arange(spp, dtype=jnp.float32)[None, :] * sub_w)
        sh = (hstart[..., None, None]
              + jnp.arange(spp, dtype=jnp.float32)[:, None] * sub_h)
        valid = ((sw >= -0.5) & (sw <= w - 0.5)
                 & (sh >= -0.5) & (sh <= h - 0.5))
        swc = jnp.clip(sw, 0., w - 1.)
        shc = jnp.clip(sh, 0., h - 1.)

        # floor/ceil bilinear (bilinear_interp, :34-57) on the bin's
        # position-sensitive score map
        x1i = jnp.floor(swc).astype(jnp.int32)
        x2i = jnp.ceil(swc).astype(jnp.int32)
        y1i = jnp.floor(shc).astype(jnp.int32)
        y2i = jnp.ceil(shc).astype(jnp.int32)
        dx = swc - x1i
        dy = shc - y1i

        od_i = jnp.arange(output_dim)[:, None, None, None, None]
        gh_i = gh_of[None, :, None, None, None]
        gw_i = gw_of[None, None, :, None, None]

        def at(yy, xx):
            return xg[yy, xx, od_i, gh_i, gw_i]

        val = ((1 - dx) * (1 - dy) * at(y1i, x1i)
               + (1 - dx) * dy * at(y2i, x1i)
               + dx * (1 - dy) * at(y1i, x2i)
               + dx * dy * at(y2i, x2i))
        vf = valid.astype(jnp.float32)
        cnt = vf.sum(axis=(-1, -2))
        total = (val * vf).sum(axis=(-1, -2))
        pooled = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1.), 0.)
        return pooled.transpose(1, 2, 0)               # (ps, ps, od)

    if offsets is None:
        return jax.vmap(lambda r: pool_one(r, None))(rois)
    return jax.vmap(pool_one)(rois, offsets)


def torch_weight_to_kco(w_oihw):
    """Convert a torch DCN weight (Cout, Cin, kh, kw) ndarray to our
    (K, Cin, Cout) layout."""
    cout, cin, kh, kw = w_oihw.shape
    return jnp.asarray(w_oihw).transpose(2, 3, 1, 0).reshape(kh * kw, cin,
                                                             cout)
