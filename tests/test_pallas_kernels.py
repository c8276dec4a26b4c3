"""Pallas kernel tests (interpret mode on CPU) vs the XLA formulations."""
import numpy as np
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.fast


def test_match_argmax_interpret_matches_xla():
    from c2matching_tpu.ops.pallas import match_argmax

    rng = np.random.RandomState(0)
    nq, nr, d = 300, 470, 64   # deliberately non-multiples of the tiles
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    r = jnp.asarray(rng.randn(nr, d).astype(np.float32))

    idx, val = match_argmax(q, r, tile_q=128, tile_r=128, interpret=True)
    corr = np.asarray(q) @ np.asarray(r).T
    np.testing.assert_array_equal(np.asarray(idx), corr.argmax(axis=1))
    np.testing.assert_allclose(np.asarray(val), corr.max(axis=1),
                               rtol=1e-5, atol=1e-5)


def test_match_argmax_tie_breaking_first_wins():
    from c2matching_tpu.ops.pallas import match_argmax

    # duplicate ref rows across tile boundaries -> exact score ties;
    # the first (lowest index) must win, as in the torch chunked merge
    d = 32
    rng = np.random.RandomState(1)
    base = rng.randn(40, d).astype(np.float32)
    r = np.concatenate([base, base, base], axis=0)  # 120 rows, idx%40 dup
    q = base[:8] * 2.0
    idx, val = match_argmax(jnp.asarray(q), jnp.asarray(r), tile_q=8,
                            tile_r=16, interpret=True)
    assert np.all(np.asarray(idx) < 40)


def test_patch_match_pallas_path_matches_xla_path():
    from c2matching_tpu.ops.patch_match import patch_match

    rng = np.random.RandomState(2)
    feat_in = jnp.asarray(rng.randn(12, 12, 8).astype(np.float32))
    feat_ref = jnp.asarray(rng.randn(12, 12, 8).astype(np.float32))

    idx_x, val_x = patch_match(feat_in, feat_ref, use_pallas=False)
    # interpret-mode pallas inside patch_match: call kernel directly on the
    # same descriptors to compare
    from c2matching_tpu.ops.patch_match import (normalize_per_pixel,
                                                unfold_descriptors)
    from c2matching_tpu.ops.pallas import match_argmax
    fi = normalize_per_pixel(feat_in)
    fr = normalize_per_pixel(feat_ref)
    q = unfold_descriptors(fi).reshape(100, -1)
    r = unfold_descriptors(fr).reshape(100, -1)
    r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-5)
    idx_p, val_p = match_argmax(q, r, tile_q=32, tile_r=32, interpret=True)
    q_norm = jnp.linalg.norm(q, axis=-1) + 1e-5
    np.testing.assert_array_equal(np.asarray(idx_x).ravel(),
                                  np.asarray(idx_p))
    np.testing.assert_allclose(np.asarray(val_x).ravel(),
                               np.asarray(val_p / q_norm), rtol=1e-5,
                               atol=1e-5)


def test_match_argmax_ref_bias_excludes_candidates():
    """The additive score bias (the bucket-pad invariance protocol's
    exclusion mechanism, ops/patch_match.py valid_shape) must remove
    biased-out rows from the argmax in the Pallas kernel exactly as in
    the XLA formulation — including rows that would otherwise win."""
    from c2matching_tpu.ops.pallas import match_argmax

    rng = np.random.RandomState(3)
    nq, nr, d = 70, 200, 32
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    r = jnp.asarray(rng.randn(nr, d).astype(np.float32))
    keep = jnp.asarray((rng.rand(nr) > 0.5).astype(np.float32))
    bias = (1.0 - keep) * -1e30

    idx, val = match_argmax(q, r, ref_bias=bias, tile_q=32, tile_r=32,
                            interpret=True)
    corr = np.asarray(q) @ np.asarray(r).T + np.asarray(bias)[None, :]
    np.testing.assert_array_equal(np.asarray(idx), corr.argmax(axis=1))
    np.testing.assert_allclose(np.asarray(val), corr.max(axis=1),
                               rtol=1e-5, atol=1e-5)
    # every winner is a kept row (the excluded set contains the
    # unbiased winner for ~half the queries, so this is a real check)
    assert np.all(np.asarray(keep)[np.asarray(idx)] == 1.0)


def test_patch_match_valid_shape_pallas_vs_xla_vmapped():
    """batched_patch_match with valid_shape: the Pallas path (forced,
    interpret mode) must equal the XLA path under vmap — the bias row is
    an UNBATCHED closed-over input inside the vmapped kernel call."""
    import functools

    import jax

    from c2matching_tpu.ops.patch_match import patch_match

    rng = np.random.RandomState(4)
    feat_in = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    feat_ref = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    vs = (9, 10)  # feature-scale valid sizes < 12

    def run(use_pallas):
        # patch_match's auto-select never picks Pallas on CPU; force the
        # kernel and run it in interpret mode via a monkeypatched entry
        if use_pallas:
            from c2matching_tpu.ops import pallas as pallas_mod
            orig = pallas_mod.match_argmax
            pallas_mod.match_argmax = functools.partial(
                orig, tile_q=32, tile_r=32, interpret=True)
            try:
                return jax.vmap(functools.partial(
                    patch_match, use_pallas=True, valid_shape=vs))(
                        feat_in, feat_ref)
            finally:
                pallas_mod.match_argmax = orig
        return jax.vmap(functools.partial(
            patch_match, use_pallas=False, valid_shape=vs))(
                feat_in, feat_ref)

    idx_x, val_x = run(use_pallas=False)
    idx_p, val_p = run(use_pallas=True)
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_allclose(np.asarray(val_x), np.asarray(val_p),
                               rtol=1e-5, atol=1e-5)
    # exclusion semantics: every winner lies inside the valid window
    hh = np.asarray(idx_x) // 10   # ref descriptor grid is 10x10
    ww = np.asarray(idx_x) % 10
    assert np.all(hh < vs[0] - 2) and np.all(ww < vs[1] - 2)
