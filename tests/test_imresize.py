"""MATLAB-compatible bicubic imresize properties + resize_flow."""
import numpy as np

import pytest

pytestmark = pytest.mark.fast


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


def _load_reference_util():
    """Load /root/reference/mmsr/data/util.py at runtime (read-only
    comparison target; cv2/mmcv/mmsr stubs injected — only imresize_np
    and its helpers are exercised, which need none of them)."""
    import importlib
    import importlib.util
    import sys
    import types
    path = '/root/reference/mmsr/data/util.py'
    import os
    if not os.path.exists(path):
        import pytest
        pytest.skip('reference tree not available')
    stubbed = []
    for name in ('cv2', 'mmcv', 'mmsr', 'mmsr.data',
                 'mmsr.data.transforms'):
        try:
            importlib.import_module(name)
        except ImportError:
            if name not in sys.modules:
                m = types.ModuleType(name)
                if name.endswith('transforms'):
                    m.totensor = lambda *a, **k: None
                sys.modules[name] = m
                stubbed.append(name)
    try:
        spec = importlib.util.spec_from_file_location('_ref_util', path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)
    return mod


def test_imresize_matches_reference_implementation():
    """Numerical proof against the reference's own imresize_np
    (/root/reference/mmsr/data/util.py:424-548) across scales and odd
    sizes — including the boundary-column drop rule, where the two
    implementations' conditions are phrased differently (ours drops
    all-zero first/last columns one side at a time; the reference drops
    both outer columns when either has any zero)."""
    ref = _load_reference_util()
    from c2matching_tpu.data.util import imresize_np

    rng = np.random.RandomState(7)
    for (h, w) in ((32, 32), (31, 29), (17, 23), (160, 160), (13, 40)):
        img = rng.rand(h, w, 3).astype(np.float32)
        for scale in (0.25, 0.5, 2.0, 4.0):
            ours = imresize_np(img, scale)
            theirs = np.asarray(ref.imresize_np(img, scale))
            assert ours.shape == theirs.shape, (h, w, scale)
            np.testing.assert_allclose(
                ours, theirs, atol=2e-5,
                err_msg=f'size=({h},{w}) scale={scale}')
        # antialiasing-off path. At scale 0.25 the REFERENCE itself
        # crashes (sym_len_He becomes 0 and its torch narrow/copy_ of an
        # empty patch raises) — ours handles that edge; compare at 0.5
        # where both run.
        ours = imresize_np(img, 0.5, antialiasing=False)
        theirs = np.asarray(ref.imresize_np(img, 0.5, antialiasing=False))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)
        imresize_np(img, 0.25, antialiasing=False)  # no crash on ours


def test_resize_flow():
    import jax.numpy as jnp
    from c2matching_tpu.ops.flow import resize_flow
    flow = jnp.ones((1, 8, 8, 2))
    out = resize_flow(flow, 'ratio', (2.0, 2.0))
    assert out.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)
    out2 = resize_flow(flow, 'shape', (4, 12))
    assert out2.shape == (1, 4, 12, 2)
