"""Composite end-to-end parity against the reference's OWN code.

The north-star QA gate of the upstream repo is full-pipeline numerical
agreement (ref_restoration_model.py:271-278 test(), :295-370 eval).
Pretrained weights / CUFED5 data are unavailable in this environment, so
this harness builds the executable reference instead: the reference's
torch arch modules loaded verbatim from /root/reference on CPU, with the
CUDA-only DCNv2 backend swapped for a numpy transcription of the CUDA
kernel semantics (tests/reference_stack.py). Both stacks load IDENTICAL
(random, seeded) weights; the whole pipeline is then run both ways at
real CUFED5 eval scale (HR 512x336 -> LR 128x84) and the outputs pinned
to PSNR-grade agreement (max|delta| < 1e-3 in [0,1] output space).

Chain of trust:
  CUDA kernel semantics -> per-pixel loop oracle (test_deform_conv.py)
    -> vectorized numpy _ext stub (test_ext_stub_matches_loop_oracle)
    -> reference torch stack (verbatim module code)
    -> composite parity (this file) -> our JAX stack.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_stack import (load_reference_archs, np_dcn_v2_forward,
                             restore_modules)  # noqa: E402


@pytest.fixture(scope='module')
def ref_archs():
    archs, saved = load_reference_archs()
    yield archs
    restore_modules(saved)


def test_ext_stub_matches_loop_oracle():
    """The vectorized numpy _ext stub == the per-pixel loop oracle that
    pins the CUDA kernel semantics (test_deform_conv.py::_np_mdc)."""
    from test_deform_conv import _np_mdc
    rng = np.random.RandomState(3)
    h, w, c, g, cout = 7, 6, 8, 2, 5
    x = rng.randn(h, w, c).astype(np.float32)
    offset = (rng.randn(h, w, g, 9, 2) * 2).astype(np.float32)
    mask = rng.rand(h, w, g, 9).astype(np.float32)
    weight = rng.randn(9, c, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    ref = _np_mdc(x, offset, mask, weight, bias)

    # convert to the CUDA extension's layouts
    x_cuda = x.transpose(2, 0, 1)[None]
    off_cuda = np.zeros((1, g * 18, h, w), np.float32)
    mask_cuda = np.zeros((1, g * 9, h, w), np.float32)
    for gi in range(g):
        for t in range(9):
            off_cuda[0, gi * 18 + 2 * t] = offset[:, :, gi, t, 0]
            off_cuda[0, gi * 18 + 2 * t + 1] = offset[:, :, gi, t, 1]
            mask_cuda[0, gi * 9 + t] = mask[:, :, gi, t]
    w_cuda = weight.transpose(2, 1, 0).reshape(cout, c, 3, 3)

    out = np_dcn_v2_forward(x_cuda, w_cuda, bias, off_cuda, mask_cuda,
                            3, 3, 1, 1, 1, 1, 1, 1, g)
    np.testing.assert_allclose(out[0].transpose(1, 2, 0), ref,
                               rtol=1e-4, atol=1e-4)


def _smooth_image(rng, h, w):
    """Random smooth [0,1] image: coarse noise bilinearly upsampled plus
    mild fine noise — smooth enough for a well-posed argmax, rough enough
    to exercise every path."""
    coarse = rng.rand((h + 7) // 8 + 1, (w + 7) // 8 + 1, 3)
    yy = np.linspace(0, coarse.shape[0] - 1.001, h)
    xx = np.linspace(0, coarse.shape[1] - 1.001, w)
    y0 = np.floor(yy).astype(int)[:, None]
    x0 = np.floor(xx).astype(int)[None, :]
    fy = (yy[:, None] - y0)[..., None]
    fx = (xx[None, :] - x0)[..., None]
    img = ((1 - fy) * (1 - fx) * coarse[y0, x0]
           + (1 - fy) * fx * coarse[y0, x0 + 1]
           + fy * (1 - fx) * coarse[y0 + 1, x0]
           + fy * fx * coarse[y0 + 1, x0 + 1])
    img = img + rng.randn(h, w, 3) * 0.02
    return np.clip(img, 0., 1.).astype(np.float32)


def _build_reference_nets(ref_archs, seed=0):
    torch.manual_seed(seed)
    ext_t = ref_archs['contras'].ContrasExtractorSep()
    cg_t = ref_archs['corres'].CorrespondenceGenerationArch()
    net_t = ref_archs['restoration'].RestorationNet(
        ngf=64, n_blocks=16, groups=8)
    # the reference zero-inits conv_offset_mask (re_init_dcn_offset);
    # perturb it so predicted offsets/masks are NONtrivial and the DCN
    # offset path is actually exercised end to end.
    with torch.no_grad():
        dyn = net_t.dyn_agg_restore
        for mod in (dyn.small_dyn_agg, dyn.medium_dyn_agg,
                    dyn.large_dyn_agg):
            mod.conv_offset_mask.weight.normal_(0, 0.005)
            mod.conv_offset_mask.bias.uniform_(-0.3, 0.3)
    ext_t.eval()
    cg_t.eval()
    net_t.eval()
    return ext_t, cg_t, net_t


def _import_flax_params(ext_t, cg_t, net_t, tmp_path):
    from c2matching_tpu.utils.pth_import import (import_contras_extractor,
                                                 import_corres_generation,
                                                 import_restoration_net)
    paths = {}
    for name, mod in (('ext', ext_t), ('cg', cg_t), ('g', net_t)):
        p = str(tmp_path / f'{name}.pth')
        torch.save(mod.state_dict(), p)
        paths[name] = p
    to_j = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return (to_j(import_contras_extractor(paths['ext'])),
            to_j(import_corres_generation(paths['cg'])),
            to_j(import_restoration_net(paths['g'])))


def _run_composite(ref_archs, tmp_path, gt_h, gt_w, seed=0):
    from c2matching_tpu.models.archs import (ContrasExtractorSep,
                                             CorrespondenceGenerationArch,
                                             RestorationNet)
    lr_h, lr_w = gt_h // 4, gt_w // 4
    rng = np.random.RandomState(seed)
    img_lr = _smooth_image(rng, lr_h, lr_w)
    img_ref = _smooth_image(rng, gt_h, gt_w)

    from c2matching_tpu.data.util import imresize_np
    img_up = imresize_np(img_lr, 4.).astype(np.float32)

    ext_t, cg_t, net_t = _build_reference_nets(ref_archs, seed)
    ext_vars, cg_vars, g_vars = _import_flax_params(
        ext_t, cg_t, net_t, tmp_path)

    def chw(x):
        return torch.from_numpy(x.transpose(2, 0, 1)[None].copy())

    with torch.no_grad():
        feats_t = ext_t(chw(img_up), chw(img_ref))
        pre_offset_t, ref_feat_t = cg_t(feats_t, chw(img_ref))
        out_t = net_t(chw(img_lr), pre_offset_t, ref_feat_t)

    ext = ContrasExtractorSep()
    cg = CorrespondenceGenerationArch()
    net = RestorationNet()

    @jax.jit
    def run(ext_vars, cg_vars, g_vars, up, ref, lr):
        feats = ext.apply(ext_vars, up, ref)
        pre_offset, ref_feat = cg.apply(cg_vars, feats, ref)
        return feats, pre_offset, net.apply(g_vars, lr, pre_offset,
                                            ref_feat)

    feats_j, pre_offset_j, out_j = run(
        ext_vars, cg_vars, g_vars, jnp.asarray(img_up)[None],
        jnp.asarray(img_ref)[None], jnp.asarray(img_lr)[None])

    report = {
        'feat_delta': float(jnp.max(jnp.abs(
            feats_j['dense_features1']
            - jnp.asarray(feats_t['dense_features1'].numpy()
                          .transpose(0, 2, 3, 1))))),
        'offset_delta': float(jnp.max(jnp.abs(
            pre_offset_j['relu3_1']
            - jnp.asarray(pre_offset_t['relu3_1'].numpy())))),
        'out_delta': float(jnp.max(jnp.abs(
            out_j - jnp.asarray(out_t.numpy().transpose(0, 2, 3, 1))))),
    }
    return report


def test_composite_parity_small(ref_archs, tmp_path):
    """Fast end-to-end composite check at reduced scale (HR 160x160)."""
    report = _run_composite(ref_archs, tmp_path, 160, 160, seed=0)
    assert report['feat_delta'] < 1e-4, report
    # integer candidate flows must agree EXACTLY (argmax is discrete)
    assert report['offset_delta'] == 0.0, report
    assert report['out_delta'] < 1e-3, report


def test_composite_parity_full_scale(ref_archs, tmp_path):
    """The real gate: CUFED5 eval scale, HR 512x336 -> LR 128x84
    (VERDICT r2 item 1). Minutes on one CPU; the executable version of
    the reference's 0.05 dB PSNR criterion."""
    report = _run_composite(ref_archs, tmp_path, 512, 336, seed=1)
    assert report['feat_delta'] < 1e-4, report
    assert report['offset_delta'] == 0.0, report
    assert report['out_delta'] < 1e-3, report


@pytest.mark.proof
def test_composite_parity_production_padded_path(ref_archs, tmp_path):
    """Full-scale parity THROUGH the production eval path (VERDICT r3
    item 2): torch reference at the exact CUFED5 shape (512x336, never
    bucket-padded) vs RefRestorationModel.feed_data/test, whose LR 84 is
    bucket-padded to 96 (+12 pad rows through VGG, matcher and DCN) and
    cropped back. Passing means the bucket-padding protocol (valid-mask
    threading, tests/test_eval_padding.py) holds at full scale on the
    real model plumbing, not just on raw archs at exact shapes."""
    import jax

    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.pth_import import import_corres_generation

    gt_h, gt_w = 512, 336
    lr_h, lr_w = gt_h // 4, gt_w // 4
    assert lr_w % 16, 'need a non-bucket-multiple LR shape'
    rng = np.random.RandomState(1)
    img_lr = _smooth_image(rng, lr_h, lr_w)
    img_ref = _smooth_image(rng, gt_h, gt_w)
    from c2matching_tpu.data.util import imresize_np
    img_up = imresize_np(img_lr, 4.).astype(np.float32)

    ext_t, cg_t, net_t = _build_reference_nets(ref_archs, seed=1)
    paths = {}
    for name, mod in (('ext', ext_t), ('cg', cg_t), ('g', net_t)):
        p = str(tmp_path / f'{name}.pth')
        torch.save(mod.state_dict(), p)
        paths[name] = p

    def chw(x):
        return torch.from_numpy(x.transpose(2, 0, 1)[None].copy())

    with torch.no_grad():
        feats_t = ext_t(chw(img_up), chw(img_ref))
        pre_offset_t, ref_feat_t = cg_t(feats_t, chw(img_ref))
        out_t = net_t(chw(img_lr), pre_offset_t, ref_feat_t)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    opt = dict_to_nonedict({
        'name': 'prod_padded_parity', 'is_train': False,
        'model_type': 'RefRestorationModel', 'scale': 4, 'crop_border': 4,
        'manual_seed': 1,
        'network_g': {'type': 'RestorationNet', 'ngf': 64, 'n_blocks': 16,
                      'groups': 8},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'models': str(tmp_path), 'training_state': str(tmp_path),
                 'visualization': str(tmp_path),
                 'pretrain_model_g': paths['g'],
                 'pretrain_model_feature_extractor': paths['ext'],
                 'strict_load': True},
    })
    model = create_model(opt)
    model.vars_map = model.replicate(
        jax.tree.map(jnp.asarray, import_corres_generation(paths['cg'])))

    model.feed_data({'img_in': np.zeros((1, gt_h, gt_w, 3), np.float32),
                     'img_in_lq': img_lr[None], 'img_in_up': img_up[None],
                     'img_ref': img_ref[None]})
    assert model._eval_crop == (gt_h, gt_w)  # the bucket pad engaged
    model.test()
    out_j = np.asarray(jax.device_get(model.output))[:, :gt_h, :gt_w]

    delta = float(np.max(np.abs(out_j - out_t)))
    assert delta < 1e-3, delta


def test_discriminator_torch_parity(ref_archs, tmp_path):
    """Reference ImageDiscriminator (verbatim torch, eval-mode BN) ->
    import_discriminator -> flax forward parity (the one arch the
    inference composite above does not cover)."""
    from c2matching_tpu.models.archs import ImageDiscriminator
    from c2matching_tpu.utils.pth_import import import_discriminator

    torch.manual_seed(5)
    d_t = ref_archs['discriminator'].ImageDiscriminator(in_nc=3, ndf=32)
    # nonzero running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        d_t.train()
        for _ in range(2):
            d_t(torch.rand(4, 3, 64, 64))
        d_t.eval()
    path = str(tmp_path / 'net_d.pth')
    torch.save(d_t.state_dict(), path)

    variables = jax.tree.map(jnp.asarray, import_discriminator(path))
    d_j = ImageDiscriminator(in_nc=3, ndf=32)

    rng = np.random.RandomState(5)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = d_t(torch.from_numpy(img.transpose(0, 3, 1, 2).copy()))
    out_j = d_j.apply(variables, jnp.asarray(img), train=False)
    np.testing.assert_allclose(
        np.asarray(out_j).reshape(-1), out_t.numpy().reshape(-1),
        rtol=1e-4, atol=1e-5)
