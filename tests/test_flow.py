"""Flow utilities vs torch-semantics oracles (index_to_flow,
tensor_shift, the 9-candidate shifted stacks; corres_generation_arch.py)."""
import numpy as np
import jax.numpy as jnp

import pytest

from c2matching_tpu.ops import (index_to_flow, match_to_pre_offsets,
                                shifted_offsets, tensor_shift, upsample_flow)

pytestmark = pytest.mark.fast


def test_index_to_flow():
    h, w = 4, 5
    # every position matches ref patch 7 (row 1, col 2)
    max_idx = np.full((h, w), 7, np.int64)
    flow = np.asarray(index_to_flow(jnp.asarray(max_idx), pad=2))
    assert flow.shape == (h + 2, w + 2, 2)
    # at position (0, 0): flow = (2-0, 1-0) = (2, 1) in (x, y) order
    np.testing.assert_allclose(flow[0, 0], [2.0, 1.0])
    # at position (1, 2): matched patch is itself -> zero flow
    np.testing.assert_allclose(flow[1, 2], [0.0, 0.0])
    # padding rows/cols are zero
    np.testing.assert_allclose(flow[h:, :, :], 0.0)
    np.testing.assert_allclose(flow[:, w:, :], 0.0)


def test_tensor_shift():
    x = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    shifted = np.asarray(tensor_shift(jnp.asarray(x), (1, 2)))
    assert shifted.shape == x.shape
    np.testing.assert_allclose(shifted[0], 0.0)
    np.testing.assert_allclose(shifted[:, :2], 0.0)
    np.testing.assert_allclose(shifted[1:, 2:], x[:2, :2])


def test_shifted_offsets_order():
    flow = np.random.RandomState(0).randn(5, 5, 2).astype(np.float32)
    out = np.asarray(shifted_offsets(jnp.asarray(flow), step=1))
    assert out.shape == (9, 5, 5, 2)
    # candidate 0 is the unshifted flow; candidate 4 is shift (1, 1)
    np.testing.assert_allclose(out[0], flow)
    np.testing.assert_allclose(out[4][1:, 1:], flow[:-1, :-1])


def test_upsample_flow_doubles_values():
    flow = np.ones((3, 3, 2), np.float32)
    up = np.asarray(upsample_flow(jnp.asarray(flow), 2))
    assert up.shape == (6, 6, 2)
    np.testing.assert_allclose(up, 2.0)


def test_match_to_pre_offsets_shapes():
    h, w = 6, 7  # relu3 feature is (h+2, w+2) after padding
    max_idx = np.zeros((h, w), np.int64)
    offs = match_to_pre_offsets(jnp.asarray(max_idx))
    assert offs['relu3_1'].shape == (9, h + 2, w + 2, 2)
    assert offs['relu2_1'].shape == (9, 2 * (h + 2), 2 * (w + 2), 2)
    assert offs['relu1_1'].shape == (9, 4 * (h + 2), 4 * (w + 2), 2)


def test_flow_warp_matches_torch_grid_sample():
    """Exact parity with the reference's flow_warp semantics
    (arch_util.py:191-220): grid + flow normalized by 2v/(W-1)-1 into
    F.grid_sample(bilinear, zeros, align_corners=False)."""
    import torch
    import torch.nn.functional as F
    from c2matching_tpu.ops.flow import flow_warp

    rng = np.random.RandomState(0)
    x = rng.rand(2, 7, 9, 3).astype(np.float32)          # NHWC
    flow = (rng.rand(2, 7, 9, 2) * 4 - 2).astype(np.float32)

    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)          # NCHW
    ft = torch.from_numpy(flow)
    h, w = 7, 9
    gy, gx = torch.meshgrid(torch.arange(h).float(),
                            torch.arange(w).float())
    grid = torch.stack((gx, gy), 2)
    vgrid = grid + ft
    vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(xt, torch.stack((vx, vy), dim=3),
                        mode='bilinear', padding_mode='zeros',
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_resize_flow_matches_torch_interpolate():
    """resize_flow == the reference's F.interpolate(bilinear,
    align_corners=False) with value rescaling (arch_util.py:224-267),
    both up- and downscaling (torch does NOT antialias)."""
    import torch
    import torch.nn.functional as F
    from c2matching_tpu.ops.flow import resize_flow

    rng = np.random.RandomState(1)
    flow = (rng.rand(2, 8, 12, 2) * 6 - 3).astype(np.float32)

    for size_type, sizes in (('ratio', (0.5, 0.5)), ('ratio', (2.0, 2.0)),
                             ('shape', (5, 9))):
        got = np.asarray(resize_flow(jnp.asarray(flow), size_type, sizes))

        ft = torch.from_numpy(flow).permute(0, 3, 1, 2).clone()  # N2HW
        fh, fw = 8, 12
        if size_type == 'ratio':
            oh, ow = int(fh * sizes[0]), int(fw * sizes[1])
        else:
            oh, ow = sizes
        ft[:, 0] *= ow / fw
        ft[:, 1] *= oh / fh
        ref = F.interpolate(ft, size=(oh, ow), mode='bilinear',
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f'{size_type} {sizes}')
