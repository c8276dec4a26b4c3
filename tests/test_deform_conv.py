"""modulated_deform_conv vs a numpy oracle that mirrors the CUDA kernel
semantics (dcn_v2_im2col_cuda.cu:125-195), plus gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp

from c2matching_tpu.ops import modulated_deform_conv
from c2matching_tpu.ops.deform_conv import modulated_deform_conv_reference

import pytest

pytestmark = pytest.mark.fast


def _np_bilinear(img, y, x):
    """Zero-padded bilinear sample of img:(H, W, C) at float (y, x),
    mirroring dmcn_im2col_bilinear + the out-of-range guard."""
    h, w, _ = img.shape
    if not (y > -1 and x > -1 and y < h and x < w):
        return np.zeros(img.shape[-1], img.dtype)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    fy, fx = y - y0, x - x0
    val = np.zeros(img.shape[-1], img.dtype)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                val += wy * wx * img[yy, xx]
    return val


def _np_mdc(x, offset, mask, weight, bias, stride=1, pad=1, dil=1):
    """Oracle. x:(H,W,C) offset:(Ho,Wo,G,K,2) mask:(Ho,Wo,G,K)
    weight:(K,C,Cout)."""
    h, w, c = x.shape
    ho, wo, g, k, _ = offset.shape
    kh = kw = int(np.sqrt(k))
    cg = c // g
    cout = weight.shape[-1]
    out = np.zeros((ho, wo, cout), np.float32)
    for i in range(ho):
        for j in range(wo):
            cols = np.zeros((k, c), np.float32)
            for ki in range(kh):
                for kj in range(kw):
                    tap = ki * kw + kj
                    for gi in range(g):
                        dy, dx = offset[i, j, gi, tap]
                        sy = i * stride - pad + ki * dil + dy
                        sx = j * stride - pad + kj * dil + dx
                        sample = _np_bilinear(
                            x[:, :, gi * cg:(gi + 1) * cg], sy, sx)
                        cols[tap, gi * cg:(gi + 1) * cg] = (
                            sample * mask[i, j, gi, tap])
            out[i, j] = np.einsum('kc,kco->o', cols, weight) + bias
    return out


def _random_case(rng, h=6, w=5, c=4, g=2, cout=3):
    x = rng.randn(1, h, w, c).astype(np.float32)
    offset = (rng.randn(1, h, w, g, 9, 2) * 2).astype(np.float32)
    mask = rng.rand(1, h, w, g, 9).astype(np.float32)
    weight = rng.randn(9, c, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    return x, offset, mask, weight, bias


def test_mdc_matches_oracle():
    rng = np.random.RandomState(0)
    x, offset, mask, weight, bias = _random_case(rng)
    out = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias))
    ref = _np_mdc(x[0], offset[0], mask[0], weight, bias)
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-4, atol=1e-4)


def test_mdc_zero_offset_equals_conv():
    """With zero offsets and mask=1 the op must equal a plain 3x3 conv."""
    rng = np.random.RandomState(1)
    h, w, c, cout = 8, 8, 4, 5
    x = rng.randn(1, h, w, c).astype(np.float32)
    weight = rng.randn(9, c, cout).astype(np.float32)
    offset = np.zeros((1, h, w, 1, 9, 2), np.float32)
    mask = np.ones((1, h, w, 1, 9), np.float32)
    out = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None)

    w_hwio = weight.reshape(3, 3, c, cout)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_hwio), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_mdc_gradients():
    """Finite-difference check of all VJPs — the analytic coordinate
    gradients (dcn_v2_im2col_cuda.cu:82-123) fall out of autodiff."""
    rng = np.random.RandomState(2)
    x, offset, mask, weight, bias = _random_case(rng, h=5, w=4, c=2, g=1,
                                                 cout=2)
    # keep offsets away from integer lattice points where bilinear has kinks
    offset = np.floor(offset) + 0.37

    def f(x, offset, mask, weight, bias):
        return jnp.sum(modulated_deform_conv(
            x, offset, mask, weight, bias) ** 2)

    args = tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))
    grads = jax.grad(f, argnums=tuple(range(5)))(*args)
    eps = 1e-3
    for argi in range(5):
        g = np.asarray(grads[argi])
        flat = np.asarray(args[argi]).ravel()
        # probe a handful of coordinates with central differences
        probe = rng.choice(flat.size, size=min(8, flat.size), replace=False)
        for idx in probe:
            pert = np.zeros_like(flat)
            pert[idx] = eps
            a_plus = list(map(np.asarray, args))
            a_minus = list(map(np.asarray, args))
            a_plus[argi] = (flat + pert).reshape(a_plus[argi].shape)
            a_minus[argi] = (flat - pert).reshape(a_minus[argi].shape)
            fd = (float(f(*map(jnp.asarray, a_plus)))
                  - float(f(*map(jnp.asarray, a_minus)))) / (2 * eps)
            np.testing.assert_allclose(g.ravel()[idx], fd, rtol=2e-2,
                                       atol=2e-2)


def test_mdc_is_twice_differentiable():
    rng = np.random.RandomState(3)
    x, offset, mask, weight, bias = _random_case(rng, h=4, w=4, c=2, g=1,
                                                 cout=2)
    args = tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))

    def f(x, offset, mask, weight, bias):
        return jnp.sum(modulated_deform_conv(
            x, offset, mask, weight, bias) ** 2)

    g = jax.grad(f, argnums=0)
    hvp = jax.grad(lambda *a: jnp.vdot(g(*a), a[0]), argnums=0)(*args)
    assert np.all(np.isfinite(np.asarray(hvp)))


def test_fast_path_matches_reference():
    """The corner-packed group-scan implementation must match the
    oracle-tested reference formulation."""
    rng = np.random.RandomState(7)
    x, offset, mask, weight, bias = _random_case(rng, h=9, w=7, c=8, g=4,
                                                 cout=6)
    a = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias))
    b = modulated_deform_conv_reference(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


def test_bf16_input_close_to_f32():
    """Passing x as bfloat16 (the byte-bound-gather serving option) must
    stay within bf16 rounding of the f32 path: values round to bf16 but
    sampling coordinates stay f32."""
    rng = np.random.RandomState(11)
    x, offset, mask, weight, bias = _random_case(rng, h=9, w=7, c=8, g=4,
                                                 cout=6)
    # large flow-like offsets: coords must NOT lose precision
    offset = offset + rng.randint(-6, 6, size=(1, 1, 1, 1, 9, 2)).astype(
        np.float32)
    a = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias))
    b = modulated_deform_conv(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(offset),
        jnp.asarray(mask), jnp.asarray(weight), jnp.asarray(bias))
    assert b.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(a)))
    err = float(jnp.max(jnp.abs(a - b)))
    assert err < 0.03 * scale, (err, scale)
    # and it must NOT be bit-identical (proves the bf16 path was taken)
    assert err > 0.0
