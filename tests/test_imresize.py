"""MATLAB-compatible bicubic imresize properties + resize_flow."""
import numpy as np


def test_imresize_constant_preserved():
    from c2matching_tpu.data.util import imresize_np
    img = np.full((16, 12, 3), 0.42, np.float32)
    for scale in (0.25, 0.5, 2.0):
        out = imresize_np(img, scale)
        np.testing.assert_allclose(out, 0.42, atol=1e-6)


def test_imresize_shapes():
    from c2matching_tpu.data.util import imresize_np
    img = np.random.RandomState(0).rand(20, 12, 3).astype(np.float32)
    assert imresize_np(img, 0.25).shape == (5, 3, 3)
    assert imresize_np(img, 4).shape == (80, 48, 3)
    assert imresize_np(img[..., 0], 0.5).shape == (10, 6)


def test_imresize_linearity():
    from c2matching_tpu.data.util import imresize_np
    rng = np.random.RandomState(1)
    a = rng.rand(16, 16, 3).astype(np.float32)
    b = rng.rand(16, 16, 3).astype(np.float32)
    lhs = imresize_np(a + 2 * b, 0.5)
    rhs = imresize_np(a, 0.5) + 2 * imresize_np(b, 0.5)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_imresize_downsample_antialias_differs():
    """antialiasing must change downsampling (it widens the kernel)."""
    from c2matching_tpu.data.util import imresize_np
    rng = np.random.RandomState(2)
    img = rng.rand(32, 32, 3).astype(np.float32)
    with_aa = imresize_np(img, 0.25, antialiasing=True)
    without = imresize_np(img, 0.25, antialiasing=False)
    assert np.abs(with_aa - without).max() > 1e-3


def test_back_projection_reduces_lr_residual():
    """back-projection must reduce ||down(sr) - lr||."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    from back_projection import backprojection
    from c2matching_tpu.data.util import imresize_np

    rng = np.random.RandomState(3)
    gt = rng.rand(32, 32, 3).astype(np.float32)
    lr = imresize_np(gt, 0.25)
    sr0 = np.clip(gt + rng.randn(32, 32, 3).astype(np.float32) * 0.1, 0, 1)
    res0 = np.abs(imresize_np(sr0, 0.25) - lr).mean()
    sr1 = backprojection(sr0, lr, iters=10, scale=4)
    res1 = np.abs(imresize_np(sr1, 0.25) - lr).mean()
    assert res1 < res0 * 0.2


def test_resize_flow():
    import jax.numpy as jnp
    from c2matching_tpu.ops.flow import resize_flow
    flow = jnp.ones((1, 8, 8, 2))
    out = resize_flow(flow, 'ratio', (2.0, 2.0))
    assert out.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)
    out2 = resize_flow(flow, 'shape', (4, 12))
    assert out2.shape == (1, 4, 12, 2)
