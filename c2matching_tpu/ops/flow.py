"""Flow/offset-field utilities for correspondence-seeded aggregation.

TPU-native, fully vectorized replacements for the reference's per-image
helpers: index_to_flow (corres_generation_arch.py:29-46), tensor_shift
(arch_util.py:291-315), the 9-candidate shifted-offset stacks
(corres_generation_arch.py:72-104), and flow_warp (arch_util.py:191-220).
"""
import functools

import jax
import jax.numpy as jnp


def index_to_flow(max_idx, pad=2):
    """Convert flat argmax indices into a relative flow field.

    Args:
        max_idx: (h, w) int array of flat row-major ref-patch indices
            (values in [0, h*w)).
        pad: zero-padding added on the bottom/right so the flow matches the
            pre-crop feature size (the reference pads by 2 for patch_size 3,
            corres_generation_arch.py:44).

    Returns:
        (h+pad, w+pad, 2) float32 flow, last dim (x, y) displacement —
        the reference's channel order (:41-43).
    """
    h, w = max_idx.shape
    flow_w = (max_idx % w).astype(jnp.float32)
    flow_h = (max_idx // w).astype(jnp.float32)
    grid_x = jnp.arange(w, dtype=jnp.float32)[None, :]
    grid_y = jnp.arange(h, dtype=jnp.float32)[:, None]
    flow = jnp.stack((flow_w - grid_x, flow_h - grid_y), axis=-1)
    return jnp.pad(flow, ((0, pad), (0, pad), (0, 0)))


def tensor_shift(x, shift, fill_val=0.0):
    """Shift a (h, w, c) array down/right by (shift_h, shift_w) with fill.

    Equivalent to arch_util.tensor_shift (:291-315) without the batch dim.
    """
    shift_h, shift_w = shift
    return jnp.pad(
        x, ((shift_h, 0), (shift_w, 0), (0, 0)),
        constant_values=fill_val)[:x.shape[0], :x.shape[1], :]


def shifted_offsets(flow, step):
    """Stack the 9 (i*step, j*step) shifted copies of a flow field.

    flow: (h, w, 2). Returns (9, h, w, 2) with candidates ordered
    (i, j) row-major — the reference's loop order
    (corres_generation_arch.py:73-76).
    """
    outs = [tensor_shift(flow, (i * step, j * step))
            for i in range(3) for j in range(3)]
    return jnp.stack(outs, axis=0)


def upsample_flow(flow, factor):
    """Nearest-upsample a flow field by an integer factor and scale its
    magnitude accordingly (repeat_interleave x factor, values x factor;
    corres_generation_arch.py:81-83).

    Implemented as broadcast+reshape rather than jnp.repeat: repeat's
    window lowering miscompiles when fused across stage boundaries on TPU
    (fusion_emitter window_bounds!=strides check).
    """
    h, w, c = flow.shape
    f = factor
    up = jnp.broadcast_to(flow[:, None, :, None, :], (h, f, w, f, c))
    return up.reshape(h * f, w * f, c) * float(factor)


@functools.partial(jax.jit, static_argnames=('patch_size',))
def match_to_pre_offsets(max_idx, patch_size=3, valid_shape=None):
    """From a single image's match indices to the three-scale 9-candidate
    pre-offset stacks used by the restoration net.

    Args:
        max_idx: (h-2, w-2) flat match indices at relu3_1 scale.
        valid_shape: None, or (vh, vw) valid relu3-scale sizes when the
            features are bucket-padded (eval invariance protocol): the
            exact-shape run zero-pads the flow's last ``pad`` rows/cols
            at ITS border (index_to_flow), which here lies inside the
            padded grid — so the flow is re-zeroed at rows >= vh-pad /
            cols >= vw-pad to match.

    Returns:
        dict with 'relu3_1': (9, h, w, 2), 'relu2_1': (9, 2h, 2w, 2),
        'relu1_1': (9, 4h, 4w, 2); last dim (x, y).
    """
    pad = patch_size - 1
    flow3 = index_to_flow(max_idx, pad=pad)           # (h, w, 2)
    if valid_shape is not None:
        h, w = flow3.shape[:2]
        vh = jnp.asarray(valid_shape[0], jnp.int32) - pad
        vw = jnp.asarray(valid_shape[1], jnp.int32) - pad
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1)
        flow3 = flow3 * ((row < vh) & (col < vw)).astype(flow3.dtype)
    offsets3 = shifted_offsets(flow3, step=1)

    flow2 = upsample_flow(flow3, 2)
    offsets2 = shifted_offsets(flow2, step=2)

    flow1 = upsample_flow(flow3, 4)
    offsets1 = shifted_offsets(flow1, step=4)

    return {'relu3_1': offsets3, 'relu2_1': offsets2, 'relu1_1': offsets1}


def batched_pre_offsets(max_idx, patch_size=3, valid_shape=None):
    """vmap of ``match_to_pre_offsets`` over the batch: (B, h-2, w-2) ->
    dict of (B, 9, H, W, 2). ``valid_shape`` is batch-uniform (the eval
    bucketing keys on exact shapes, so a bucket's batch shares one)."""
    return jax.vmap(
        functools.partial(match_to_pre_offsets, patch_size=patch_size,
                          valid_shape=valid_shape))(max_idx)


def resize_flow(flow, size_type, sizes, method='bilinear'):
    """Resize a flow field by ratio or to a shape, rescaling its values
    (arch_util.resize_flow :223-267). flow: (B, H, W, 2) (x, y) order."""
    b, flow_h, flow_w, _ = flow.shape
    if size_type == 'ratio':
        output_h = int(flow_h * sizes[0])
        output_w = int(flow_w * sizes[1])
    elif size_type == 'shape':
        output_h, output_w = sizes
    else:
        raise ValueError(
            f'Size type should be ratio or shape, but got {size_type}.')
    ratio_h = output_h / flow_h
    ratio_w = output_w / flow_w
    scaled = flow * jnp.asarray([ratio_w, ratio_h], flow.dtype)
    # torch F.interpolate(bilinear, align_corners=False) semantics with
    # NO antialiasing (jax.image.resize antialiases on downscale, and
    # its window-op lowering trips the TPU fusion emitter — CLAUDE.md)
    if method != 'bilinear':
        raise NotImplementedError(method)
    from .resize import bilinear_resize
    return bilinear_resize(scaled, output_h, output_w)


def flow_warp(x, flow):
    """Bilinear warp of x:(B, H, W, C) by flow:(B, H, W, 2) ((x, y) order),
    zero padding. Exact arch_util.flow_warp (:191-220) semantics: the
    reference normalizes v -> 2v/max(W-1,1) - 1 and samples with
    F.grid_sample(align_corners=False), whose un-normalization is
    pix = ((u+1)*W - 1)/2 — i.e. it actually samples at
    v*W/(W-1) - 0.5 per axis (a border-growing rescale, NOT plain
    grid + flow; at v=0 it reads -0.5, halving the border value under
    zero padding). Unused by the model family (BasicSR carry-over, no
    call sites upstream) but kept numerically faithful as exported API.
    """
    b, h, w, c = x.shape
    grid_y = jnp.arange(h, dtype=jnp.float32)[:, None]
    grid_x = jnp.arange(w, dtype=jnp.float32)[None, :]
    vy = grid_y + flow[..., 1]
    vx = grid_x + flow[..., 0]
    # torch round trip: u = 2v/max(n-1,1) - 1; pix = ((u+1)*n - 1)/2
    sy = vy * (h / max(h - 1, 1)) - 0.5
    sx = vx * (w / max(w - 1, 1)) - 0.5

    def sample_one(img, sy, sx):
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = sy - y0
        fx = sx - x0

        def corner(dy, dx):
            yy = y0.astype(jnp.int32) + dy
            xx = x0.astype(jnp.int32) + dx
            wy = jnp.where(dy == 0, 1.0 - fy, fy)
            wx = jnp.where(dx == 0, 1.0 - fx, fx)
            inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            weight = (wy * wx * inb).astype(img.dtype)
            flat = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            vals = img.reshape(h * w, c)[flat.reshape(-1)].reshape(h, w, c)
            return vals * weight[..., None]

        return corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)

    return jax.vmap(sample_one)(x, sy, sx)
