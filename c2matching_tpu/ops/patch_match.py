"""Dense patch matching between input and reference features.

This is the TPU-native replacement for the reference's chunked conv2d
correlation search (mmsr/models/archs/ref_map_util.py:26-86 +
corres_generation_arch.py:48-117). Instead of iterating 3x3 ref patches as
conv filters in Python-loop chunks, both feature maps are unfolded into
patch-descriptor matrices and correlated with one large MXU matmul
(or a blocked Pallas kernel with an online max/argmax reduction for big
images — see ``pallas_patch_match``).

Semantics pinned to the reference:
- features are first L2-normalized per spatial position over channels
  (corres_generation_arch.py:56-58);
- ref patch descriptors are L2-normalized per patch with a +1e-5 on the
  norm (ref_map_util.py:63);
- correlation = <input 3x3 window, normalized ref patch>, valid positions
  only (no padding) -> output spatial size (h-2, w-2) for patch_size 3;
- argmax over ref patches, first-max-wins tie-breaking (torch chunked
  running-max merge uses strict '>', ref_map_util.py:74);
- max value divided by the input patch norm (+1e-5) (ref_map_util.py:78-84).
"""
import functools

import jax
import jax.numpy as jnp


def normalize_per_pixel(feat, eps=1e-12):
    """L2-normalize each spatial position's channel vector. feat: (H, W, C).

    Matches torch F.normalize(x.reshape(c, -1), dim=0) semantics
    (eps clamp on the norm).
    """
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True))
    return feat / jnp.maximum(norm, eps)


def unfold_descriptors(feat, patch_size=3):
    """Unfold (H, W, C) into per-position patch descriptors.

    Returns (H-p+1, W-p+1, p*p*C): descriptor[i, j] flattens the
    patch feat[i:i+p, j:j+p, :] in row-major (ky, kx, c) order — the same
    element order the reference's unfold produces per patch.
    """
    h, w, c = feat.shape
    p = patch_size
    rows = []
    for ky in range(p):
        for kx in range(p):
            rows.append(feat[ky:h - p + 1 + ky, kx:w - p + 1 + kx, :])
    # (H', W', p*p, C) -> (H', W', p*p*C)
    stacked = jnp.stack(rows, axis=2)
    return stacked.reshape(h - p + 1, w - p + 1, p * p * c)


# above this many query rows, use the blocked Pallas kernel (avoids
# materializing the (n_q x n_r) score matrix in HBM)
_PALLAS_MIN_ROWS = 4096


@functools.lru_cache(maxsize=None)
def _pallas_lowers(backend_name):
    """One-time capability probe, cached per backend name: does the
    Mosaic kernel LOWER on this backend?

    Replaces the former name-denylist ('auto' excluded cpu/gpu/cuda/rocm
    by name): tunneled TPU platforms register under their own names
    (e.g. 'axon') and must keep the kernel, but an unknown NON-Mosaic
    backend must fall back to the XLA matmul path instead of crashing.
    Lowering is client-side (no device execution, no tunnel round-trip)
    and unsupported backends fail fast at this stage ("Only interpret
    mode is supported on CPU backend"), so one tiny abstract lower()
    answers the question for the process lifetime.
    """
    from .pallas import match_argmax
    tiny = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    try:
        jax.jit(lambda a, b: match_argmax(a, b)).lower(tiny, tiny)
        return True
    except Exception:
        return False


@functools.partial(jax.jit,
                   static_argnames=('patch_size', 'use_pallas',
                                    'compute_dtype'))
def patch_match(feat_in, feat_ref, patch_size=3, use_pallas='auto',
                compute_dtype=None, valid_shape=None):
    """Dense patch matching for a single image pair.

    Args:
        feat_in: (H, W, C) input features (bicubic-upsampled LR branch).
        feat_ref: (H, W, C) reference features.
        patch_size: patch side length (default 3).
        use_pallas: True | False | 'auto' — blocked Pallas kernel with
            online argmax vs one XLA matmul + argmax. 'auto' picks Pallas
            for large images on TPU.
        compute_dtype: None (descriptor dtype, f32 in practice) or e.g.
            'bfloat16' — dtype of the correlation matmul OPERANDS (the
            serving speed knob: the f32 matmul runs multi-pass on the
            MXU; bf16 is single-pass and halves descriptor streaming).
            Normalization, accumulation and the final value stay f32;
            only near-tie argmax decisions can flip (~0.4% descriptor
            rounding).
        valid_shape: None, or (vh, vw) valid FEATURE sizes (ints or
            traced scalars) when the features are bucket-padded: ref
            patches extending past the valid region are excluded from
            the argmax (score -1e30), so the winner set equals the
            exact-shape run's (the reference never pads to buckets —
            eval invariance protocol, arch_util.valid_mask).

    Returns:
        (max_idx, max_val): both (H-p+1, W-p+1). ``max_idx`` is the flat
        row-major index of the best-matching ref patch; ``max_val`` the
        normalized correlation.
    """
    feat_in = normalize_per_pixel(feat_in)
    feat_ref = normalize_per_pixel(feat_ref)

    d_in = unfold_descriptors(feat_in, patch_size)    # (H', W', D)
    d_ref = unfold_descriptors(feat_ref, patch_size)  # (H', W', D)
    hh, ww, dim = d_in.shape
    hr, wr = d_ref.shape[:2]
    q = d_in.reshape(hh * ww, dim)
    r = d_ref.reshape(-1, dim)

    r_norm = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True)) + 1e-5
    r = r / r_norm

    ref_bias = None
    if valid_shape is not None:
        vh = jnp.asarray(valid_shape[0], jnp.int32) - (patch_size - 1)
        vw = jnp.asarray(valid_shape[1], jnp.int32) - (patch_size - 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (hr, wr), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (hr, wr), 1)
        ok = (row < vh) & (col < vw)
        ref_bias = jnp.where(ok, 0.0, -1e30).astype(
            jnp.float32).reshape(-1)

    # q_norm from the full-precision descriptors, before any cast
    q_norm = jnp.sqrt(jnp.sum(q * q, axis=-1)) + 1e-5
    if compute_dtype is not None:
        q = q.astype(jnp.dtype(compute_dtype))
        r = r.astype(jnp.dtype(compute_dtype))

    if use_pallas == 'auto':
        # the kernel is Mosaic-TPU only — other backends must take the
        # XLA matmul path, not crash at lowering. Capability probe, not
        # a backend-name list: tunneled TPU platforms register under
        # their own names (e.g. 'axon') and must keep the kernel, while
        # any non-Mosaic backend (known or future) falls back safely.
        use_pallas = (hh * ww >= _PALLAS_MIN_ROWS
                      and _pallas_lowers(jax.default_backend()))
    if use_pallas:
        from .pallas import match_argmax
        max_idx, max_val = match_argmax(q, r, ref_bias=ref_bias)
    else:
        # One large MXU matmul: (n_q, D) @ (D, n_r).
        corr = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
        if ref_bias is not None:
            corr = corr + ref_bias[None, :]
        max_idx = jnp.argmax(corr, axis=-1)
        max_val = jnp.max(corr, axis=-1)

    max_val = max_val / q_norm

    return (max_idx.reshape(hh, ww).astype(jnp.int32),
            max_val.reshape(hh, ww))


def batched_patch_match(feat_in, feat_ref, patch_size=3,
                        compute_dtype=None, valid_shape=None):
    """vmap of ``patch_match`` over the batch axis.

    Replaces the reference's per-image Python loop
    (corres_generation_arch.py:52).
    feat_in/feat_ref: (B, H, W, C). ``valid_shape`` is batch-uniform
    (the eval bucketing keys on exact shapes).
    """
    return jax.vmap(
        functools.partial(patch_match, patch_size=patch_size,
                          compute_dtype=compute_dtype,
                          valid_shape=valid_shape))(feat_in, feat_ref)
