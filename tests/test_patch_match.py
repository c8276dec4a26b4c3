"""patch_match vs a naive numpy oracle implementing the reference
semantics (mmsr/models/archs/ref_map_util.py + corres_generation_arch.py)."""
import numpy as np
import jax.numpy as jnp

from c2matching_tpu.ops import patch_match, batched_patch_match

import pytest

pytestmark = pytest.mark.fast


def _np_normalize_per_pixel(feat):
    norm = np.sqrt((feat**2).sum(axis=-1, keepdims=True))
    return feat / np.maximum(norm, 1e-12)


def _np_patch_match(feat_in, feat_ref, p=3):
    """Naive O(n^2) oracle. feat_*: (H, W, C)."""
    feat_in = _np_normalize_per_pixel(feat_in)
    feat_ref = _np_normalize_per_pixel(feat_ref)
    h, w, c = feat_in.shape
    hh, ww = h - p + 1, w - p + 1

    def unfold(feat):
        out = np.zeros((hh, ww, p, p, c), feat.dtype)
        for i in range(hh):
            for j in range(ww):
                out[i, j] = feat[i:i + p, j:j + p]
        return out.reshape(hh, ww, -1)

    d_in = unfold(feat_in)
    d_ref = unfold(feat_ref).reshape(hh * ww, -1)
    d_ref_n = d_ref / (np.linalg.norm(d_ref, axis=-1, keepdims=True) + 1e-5)

    corr = d_in.reshape(hh * ww, -1) @ d_ref_n.T
    max_idx = corr.argmax(axis=-1)
    max_val = corr.max(axis=-1)
    in_norm = np.linalg.norm(d_in.reshape(hh * ww, -1), axis=-1) + 1e-5
    max_val = max_val / in_norm
    return max_idx.reshape(hh, ww), max_val.reshape(hh, ww)


def test_patch_match_matches_oracle():
    rng = np.random.RandomState(0)
    feat_in = rng.randn(10, 12, 8).astype(np.float32)
    feat_ref = rng.randn(10, 12, 8).astype(np.float32)

    idx, val = patch_match(jnp.asarray(feat_in), jnp.asarray(feat_ref))
    ref_idx, ref_val = _np_patch_match(feat_in, feat_ref)

    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(val), ref_val, rtol=2e-5,
                               atol=2e-5)


def test_patch_match_self_is_identity():
    rng = np.random.RandomState(1)
    feat = rng.randn(9, 9, 16).astype(np.float32)
    idx, val = patch_match(jnp.asarray(feat), jnp.asarray(feat))
    hh, ww = idx.shape
    expected = np.arange(hh * ww).reshape(hh, ww)
    np.testing.assert_array_equal(np.asarray(idx), expected)
    # self-correlation of a normalized patch with itself = its norm, and
    # dividing by the norm gives ~1
    np.testing.assert_allclose(np.asarray(val), np.ones_like(val), atol=1e-4)


def test_batched_patch_match_shapes():
    rng = np.random.RandomState(2)
    feat_in = rng.randn(2, 8, 8, 4).astype(np.float32)
    feat_ref = rng.randn(2, 8, 8, 4).astype(np.float32)
    idx, val = batched_patch_match(jnp.asarray(feat_in),
                                   jnp.asarray(feat_ref))
    assert idx.shape == (2, 6, 6)
    assert val.shape == (2, 6, 6)
    # each batch entry matches the single-image op
    for b in range(2):
        i1, v1 = patch_match(jnp.asarray(feat_in[b]),
                             jnp.asarray(feat_ref[b]))
        np.testing.assert_array_equal(np.asarray(idx[b]), np.asarray(i1))


def test_patch_match_bf16_compute_tracks_f32():
    """compute_dtype='bfloat16' (serving knob) runs the correlation
    matmul in bf16: indices must agree except at genuine near-ties, and
    values stay close (normalization/accumulation remain f32)."""
    rng = np.random.RandomState(3)
    feat_in = rng.randn(14, 14, 16).astype(np.float32)
    feat_ref = rng.randn(14, 14, 16).astype(np.float32)
    i32, v32 = patch_match(jnp.asarray(feat_in), jnp.asarray(feat_ref))
    i16, v16 = patch_match(jnp.asarray(feat_in), jnp.asarray(feat_ref),
                           compute_dtype='bfloat16')
    agree = np.mean(np.asarray(i32) == np.asarray(i16))
    assert agree >= 0.95, agree
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32),
                               rtol=2e-2, atol=2e-2)
    # where indices agree, the winning score itself is bf16-close
    same = np.asarray(i32) == np.asarray(i16)
    np.testing.assert_allclose(np.asarray(v16)[same],
                               np.asarray(v32)[same], rtol=1e-2)


def test_pallas_auto_select_is_capability_probe():
    """The 'auto' path must resolve via a cached try-lower probe, not a
    backend-name list: on this CPU test backend the probe must say False
    (Mosaic cannot lower) and the big-image auto path must still run via
    the XLA matmul instead of crashing at lowering."""
    import jax
    from c2matching_tpu.ops.patch_match import _pallas_lowers

    backend = jax.default_backend()
    assert backend == 'cpu'  # conftest forces the virtual CPU mesh
    assert _pallas_lowers(backend) is False
    # cached: a second call must not re-lower
    hits_before = _pallas_lowers.cache_info().hits
    assert _pallas_lowers(backend) is False
    assert _pallas_lowers.cache_info().hits == hits_before + 1

    # 70x70 -> 68*68 = 4624 query rows > _PALLAS_MIN_ROWS: 'auto' would
    # have picked Pallas under the old name-denylist had 'cpu' not been
    # listed; with the probe it falls back and matches the oracle.
    rng = np.random.RandomState(3)
    f_in = rng.rand(70, 70, 4).astype(np.float32)
    f_ref = rng.rand(70, 70, 4).astype(np.float32)
    idx, val = patch_match(jnp.asarray(f_in), jnp.asarray(f_ref))
    ref_idx, ref_val = _np_patch_match(f_in, f_ref)
    assert (np.asarray(idx) == ref_idx).mean() > 0.999
    np.testing.assert_allclose(np.asarray(val), ref_val, atol=2e-5)
