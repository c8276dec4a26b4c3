"""DCNv1 (unmodulated), PSROI pooling, and DCN module wrappers."""
import numpy as np
import jax
import jax.numpy as jnp

from c2matching_tpu.ops import (deform_conv, deform_psroi_pooling,
                                modulated_deform_conv)


def test_deform_conv_v1_equals_mask_ones():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    off = jnp.asarray(rng.randn(1, 8, 8, 2, 9, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(9, 4, 4).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 2, 9))
    np.testing.assert_allclose(
        np.asarray(deform_conv(x, off, w)),
        np.asarray(modulated_deform_conv(x, off, mask, w)), rtol=1e-5,
        atol=1e-5)


def test_psroi_pooling_shapes_and_position_sensitivity():
    rng = np.random.RandomState(1)
    output_dim, group_size, pooled = 2, 3, 6
    c = output_dim * group_size * group_size
    x = jnp.asarray(rng.rand(16, 16, c).astype(np.float32))
    rois = jnp.asarray([[0, 2.0, 2.0, 14.0, 14.0]], jnp.float32)
    out = deform_psroi_pooling(x, rois, None, output_dim, group_size,
                               pooled, no_trans=True)
    assert out.shape == (1, pooled, pooled, output_dim)
    assert np.all(np.isfinite(np.asarray(out)))

    # position sensitivity: constant-per-score-map input reproduces the
    # group value at each bin
    maps = np.zeros((16, 16, group_size, group_size, output_dim),
                    np.float32)
    for gi in range(group_size):
        for gj in range(group_size):
            maps[:, :, gi, gj, :] = gi * 10 + gj
    out2 = deform_psroi_pooling(
        jnp.asarray(maps.reshape(16, 16, c)), rois, None, output_dim,
        group_size, pooled, no_trans=True)
    out2 = np.asarray(out2)[0, :, :, 0]
    # bin (0,0) reads group (0,0); bin (5,5) reads group (2,2)
    assert out2[0, 0] == 0.0
    assert out2[-1, -1] == 22.0


def test_dcn_module_wrappers():
    from c2matching_tpu.models.archs import DCN, DCNSep, DCNv2Module
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 8, 8, 8))
    extra = jax.random.uniform(rng, (1, 8, 8, 8))

    m = DCN(channels=8, deformable_groups=2)
    p = m.init(rng, x)
    out = m.apply(p, x)
    assert out.shape == (1, 8, 8, 8)

    m2 = DCNSep(channels=8, deformable_groups=2)
    p2 = m2.init(rng, x, extra)
    out2 = m2.apply(p2, x, extra)
    assert out2.shape == (1, 8, 8, 8)

    off = jax.random.normal(rng, (1, 8, 8, 2, 9, 2))
    mask = jax.random.uniform(rng, (1, 8, 8, 2, 9))
    m3 = DCNv2Module(channels=8, deformable_groups=2)
    p3 = m3.init(rng, x, off, mask)
    out3 = m3.apply(p3, x, off, mask)
    assert out3.shape == (1, 8, 8, 8)

    # at zero-init offset conv, DCN == plain conv with its weight
    w = p['params']['weight']
    b = p['params']['bias']
    ref = modulated_deform_conv(
        x, jnp.zeros((1, 8, 8, 2, 9, 2)), jnp.full((1, 8, 8, 2, 9), 0.5),
        w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
