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
    # group value at each bin (channel order (ctop, gh, gw) as in the
    # CUDA kernel, dcn_v2_psroi_pooling_cuda.cu:139)
    maps = np.zeros((16, 16, output_dim, group_size, group_size),
                    np.float32)
    for gi in range(group_size):
        for gj in range(group_size):
            maps[:, :, :, gi, gj] = gi * 10 + gj
    out2 = deform_psroi_pooling(
        jnp.asarray(maps.reshape(16, 16, c)), rois, None, output_dim,
        group_size, pooled, no_trans=True)
    out2 = np.asarray(out2)[0, :, :, 0]
    # bin (0,0) reads group (0,0); bin (5,5) reads group (2,2)
    assert out2[0, 0] == 0.0
    assert out2[-1, -1] == 22.0


def _np_psroi_oracle(x, rois, offsets, output_dim, gs, ps, ss, trans_std,
                     no_trans, spp, part):
    """Direct numpy transcription of DeformablePSROIPoolForwardKernel
    (dcn_v2_psroi_pooling_cuda.cu:59-148)."""
    h, w, _ = x.shape
    n = len(rois)
    out = np.zeros((n, ps, ps, output_dim), np.float32)
    nc = 1 if (no_trans or offsets is None) else offsets.shape[1]
    cec = output_dim if nc == 1 else output_dim // nc
    for ni in range(n):
        _, rx1, ry1, rx2, ry2 = [float(v) for v in rois[ni]]
        sw_ = round(rx1) * ss - 0.5
        sh_ = round(ry1) * ss - 0.5
        ew = (round(rx2) + 1) * ss - 0.5
        eh = (round(ry2) + 1) * ss - 0.5
        rw = max(ew - sw_, 0.1)
        rh = max(eh - sh_, 0.1)
        bw, bh = rw / ps, rh / ps
        sbw, sbh = bw / spp, bh / spp
        for ctop in range(output_dim):
            cls = ctop // cec
            for ph in range(ps):
                for pw in range(ps):
                    part_h = int(np.floor(ph / ps * part))
                    part_w = int(np.floor(pw / ps * part))
                    tx = ty = 0.0
                    if not (no_trans or offsets is None):
                        tx = offsets[ni, cls, 0, part_h,
                                     part_w] * trans_std
                        ty = offsets[ni, cls, 1, part_h,
                                     part_w] * trans_std
                    wst = pw * bw + sw_ + tx * rw
                    hst = ph * bh + sh_ + ty * rh
                    gwq = min(max(int(np.floor(pw * gs / ps)), 0), gs - 1)
                    ghq = min(max(int(np.floor(ph * gs / ps)), 0), gs - 1)
                    cidx = (ctop * gs + ghq) * gs + gwq
                    s, cnt = 0.0, 0
                    for ih in range(spp):
                        for iw in range(spp):
                            ww = wst + iw * sbw
                            hh = hst + ih * sbh
                            if (ww < -0.5 or ww > w - 0.5 or hh < -0.5
                                    or hh > h - 0.5):
                                continue
                            ww = min(max(ww, 0.), w - 1.)
                            hh = min(max(hh, 0.), h - 1.)
                            x1, x2 = int(np.floor(ww)), int(np.ceil(ww))
                            y1, y2 = int(np.floor(hh)), int(np.ceil(hh))
                            dxx, dyy = ww - x1, hh - y1
                            v = ((1 - dxx) * (1 - dyy) * x[y1, x1, cidx]
                                 + (1 - dxx) * dyy * x[y2, x1, cidx]
                                 + dxx * (1 - dyy) * x[y1, x2, cidx]
                                 + dxx * dyy * x[y2, x2, cidx])
                            s += v
                            cnt += 1
                    out[ni, ph, pw, ctop] = 0. if cnt == 0 else s / cnt
    return out


def test_psroi_pooling_matches_cuda_oracle():
    """Faithful semantics vs a numpy transcription of the CUDA kernel:
    rounded corners, sub-bin averaging, per-part per-class offsets,
    boundary sample dropping."""
    rng = np.random.RandomState(3)
    output_dim, gs, ps, spp = 4, 2, 3, 4
    c = output_dim * gs * gs
    x = rng.rand(12, 14, c).astype(np.float32)
    rois = np.asarray([
        [0, 1.2, 2.7, 9.9, 10.1],    # corners get rounded
        [0, 0.0, 0.0, 13.0, 11.0],   # full image
        [0, 11.0, 9.0, 13.0, 11.0],  # small corner ROI
        [0, -3.0, -3.0, 2.0, 2.0],   # partially out of bounds
    ], np.float32)
    num_classes = 2
    offsets = rng.randn(len(rois), num_classes, 2, ps, ps).astype(
        np.float32)

    for no_trans, offs in ((True, None), (False, offsets)):
        got = np.asarray(deform_psroi_pooling(
            jnp.asarray(x), jnp.asarray(rois),
            None if offs is None else jnp.asarray(offs),
            output_dim, gs, ps, spatial_scale=0.5, trans_std=0.1,
            no_trans=no_trans, sample_per_part=spp))
        want = _np_psroi_oracle(x, rois, offs, output_dim, gs, ps, 0.5,
                                0.1, no_trans, spp, ps)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


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
