"""Windowed DCN (ops/dcn_window.py) vs the exact production op."""
import numpy as np
import jax.numpy as jnp

import pytest

from c2matching_tpu.ops import modulated_deform_conv
from c2matching_tpu.ops.dcn_window import (modulated_deform_conv_windowed,
                                           window_applicable)

pytestmark = pytest.mark.fast


def _c2_shaped_case(rng, h=16, w=12, c=8, g=4, blk=4, res=0.4, flow=20):
    """Offsets with the DynAgg structure: per-tap integer flow constant
    over blk-aligned blocks, plus a small learned residual."""
    x = rng.randn(1, h, w, c).astype(np.float32)
    coarse = rng.randint(-flow, flow,
                         size=(1, h // blk, w // blk, 1, 9, 2))
    pre = np.repeat(np.repeat(coarse, blk, axis=1), blk, axis=2)
    resid = (rng.rand(1, h, w, g, 9, 2) * 2 - 1) * res
    offset = (pre + resid).astype(np.float32)
    mask = rng.rand(1, h, w, g, 9).astype(np.float32)
    weight = rng.randn(9, c, c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))


def test_windowed_matches_exact_on_c2_shaped_offsets():
    rng = np.random.RandomState(0)
    args = _c2_shaped_case(rng)
    a = modulated_deform_conv(*args)
    b = modulated_deform_conv_windowed(*args, blk=4, win=8,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-4)


def test_windowed_block2():
    rng = np.random.RandomState(1)
    args = _c2_shaped_case(rng, h=12, w=10, c=8, g=2, blk=2, res=0.3)
    a = modulated_deform_conv(*args)
    b = modulated_deform_conv_windowed(*args, blk=2, win=6,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-4)


def test_windowed_falls_back_on_arbitrary_offsets():
    """Residuals far beyond the window: the runtime cond must take the
    exact path and still match the production op bit-for-bit-ish."""
    rng = np.random.RandomState(2)
    x, offset, mask, weight, bias = _c2_shaped_case(rng)
    offset = offset + jnp.asarray(
        rng.randn(1, 16, 12, 4, 9, 2).astype(np.float32) * 5)
    a = modulated_deform_conv(x, offset, mask, weight, bias)
    b = modulated_deform_conv_windowed(x, offset, mask, weight, bias,
                                       blk=4, win=8, use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-5)


def test_windowed_border_taps():
    """Flows pushing many taps off the image: zero-pad semantics and
    origin clamping must agree with the exact path."""
    rng = np.random.RandomState(3)
    args = _c2_shaped_case(rng, flow=30)  # image is 16x12: lots outside
    a = modulated_deform_conv(*args)
    b = modulated_deform_conv_windowed(*args, blk=4, win=8,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-4)


def test_windowed_batched():
    rng = np.random.RandomState(4)
    a1 = _c2_shaped_case(rng)
    a2 = _c2_shaped_case(rng)
    args = tuple(jnp.concatenate([u, v], axis=0) if u.ndim > 1 else u
                 for u, v in zip(a1, a2))
    # weight/bias identical across batch: take a1's
    args = (args[0], args[1], args[2], a1[3], a1[4])
    a = modulated_deform_conv(*args)
    b = modulated_deform_conv_windowed(*args, blk=4, win=8,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-4)


def test_windowed_bf16_close():
    rng = np.random.RandomState(5)
    x, offset, mask, weight, bias = _c2_shaped_case(rng)
    a = modulated_deform_conv_windowed(x, offset, mask, weight, bias,
                                       blk=4, win=8, use_pallas=False)
    b = modulated_deform_conv_windowed(x.astype(jnp.bfloat16), offset,
                                       mask, weight, bias, blk=4, win=8,
                                       use_pallas=False)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 0.03 * scale


def test_window_applicable():
    assert window_applicable((1, 16, 12, 8), (1, 16, 12, 4, 9, 2), 4, 8)
    assert not window_applicable((1, 15, 12, 8), (1, 15, 12, 4, 9, 2),
                                 4, 8)
    assert not window_applicable((1, 16, 12, 8), (1, 8, 6, 4, 9, 2),
                                 4, 8, stride=(2, 2))


def test_windowed_chunked_matches_exact():
    """Row-chunked windowed path (HBM-bounded variant) == exact op on
    DynAgg-structured offsets."""
    from c2matching_tpu.ops.dcn_window import \
        modulated_deform_conv_windowed_chunked
    rng = np.random.RandomState(3)
    args = _c2_shaped_case(rng, h=32, w=12, c=8, g=4, blk=4)
    a = modulated_deform_conv(*args)
    b = modulated_deform_conv_windowed_chunked(*args, blk=4, win=8,
                                               use_pallas=False,
                                               row_chunks=4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                               atol=1e-4)
    c = modulated_deform_conv_windowed_chunked(*args, blk=4, win=8,
                                               use_pallas=True,
                                               row_chunks=2)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-4,
                               atol=1e-4)
