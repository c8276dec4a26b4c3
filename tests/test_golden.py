"""Golden regression tests: fixed-seed values recorded from the verified
implementation (SURVEY.md §4 item 2). These pin numerical behavior across
refactors; loosen only with justification."""
import numpy as np
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.fast


def _coords(h, w, batch=2):
    gx, gy = np.meshgrid(np.arange(4 * w), np.arange(4 * h))
    coords = np.stack([gx, gy, np.ones_like(gx)], -1).astype(np.float32)
    return jnp.asarray(np.stack([coords] * batch))


def test_golden_triplet_loss():
    from c2matching_tpu.models.contras_losses import triplet_loss_batch
    rng = np.random.RandomState(42)
    h = w = 24
    f1 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    loss, pos, neg, n = triplet_loss_batch(f1, f2, _coords(h, w))
    np.testing.assert_allclose(float(loss), 2.3959751, rtol=1e-5)
    np.testing.assert_allclose(float(pos), 1.9925020, rtol=1e-5)
    np.testing.assert_allclose(float(neg), 0.5965269, rtol=1e-5)
    assert int(n) == 2


def test_golden_distillation_loss():
    from c2matching_tpu.models.contras_losses import \
        distillation_loss_batch
    rng = np.random.RandomState(42)
    h = w = 24
    f1 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    t1 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    t2 = jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32))
    loss, _p, _n, distill, _k = distillation_loss_batch(
        f1, f2, t1, t2, _coords(h, w))
    np.testing.assert_allclose(float(loss), 38.373493, rtol=1e-5)
    np.testing.assert_allclose(float(distill), 2.3985012, rtol=1e-5)


def test_golden_deform_conv():
    from c2matching_tpu.ops import modulated_deform_conv
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(1, 12, 10, 8).astype(np.float32))
    off = jnp.asarray(r.randn(1, 12, 10, 2, 9, 2).astype(np.float32))
    mask = jnp.asarray(r.rand(1, 12, 10, 2, 9).astype(np.float32))
    wgt = jnp.asarray(r.randn(9, 8, 6).astype(np.float32) * 0.1)
    out = modulated_deform_conv(x, off, mask, wgt)
    np.testing.assert_allclose(float(jnp.sum(out)), -19.133776, rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(out))), 157.98320,
                               rtol=1e-4)


def test_golden_patch_match():
    """Run the deform-conv golden's RNG forward to keep stream positions
    identical to when the values were recorded."""
    from c2matching_tpu.ops import patch_match
    r = np.random.RandomState(7)
    r.randn(1, 12, 10, 8)
    r.randn(1, 12, 10, 2, 9, 2)
    r.rand(1, 12, 10, 2, 9)
    r.randn(9, 8, 6)
    fi = jnp.asarray(r.randn(14, 14, 8).astype(np.float32))
    fr = jnp.asarray(r.randn(14, 14, 8).astype(np.float32))
    idx, val = patch_match(fi, fr)
    assert int(jnp.sum(idx)) == 9844
    np.testing.assert_allclose(float(jnp.sum(val)), 44.579063, rtol=1e-5)
