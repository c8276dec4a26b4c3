"""One-step TRAINING parity against the reference's own torch stack
(VERDICT r3 item 1 — the strongest executable substitute for the 0.05 dB
criterion with weights/data unavailable).

The composite forward harness (test_composite_parity.py) pins inference;
this file extends the chain of trust through the BACKWARD pass and the
optimizer: the numpy ``_ext`` stub gains a backward (autograd through a
differentiable torch transcription whose gradients are the analytic CUDA
formulas, reference_stack.torch_dcn_v2_forward), then 2-3 real optimizer
steps of every training stage run in BOTH frameworks from identical
seeded weights and identical batches:

- stage 3 G-pretrain (ref_restoration_model.py:199-207): L1-only G step;
- stage 3 GAN phase (:209-269): D WGAN + gradient penalty (double
  backward THROUGH the numpy-stub DCN backward on the G side is never
  required — GP differentiates only the plain-conv D twice), then the G
  step with pixel + fro-perceptual + GAN-G against the UPDATED D;
- stage 1 teacher triplet (teacher_contras_model.py:212-227);
- stage 2 student distillation (student_contras_..._model.py:259-275).

Pinned per step: every log_dict loss; after the last step: elementwise
param agreement bounded by the Adam step sizes, and the framework-vs-
framework parameter-delta norm ratio.

Randomness: the only stochastic element inside any step is WGAN-GP's
interpolation alpha — pinned to identical per-step values on both sides
(torch.rand patched; our gradient_penalty_loss takes alpha explicitly).
"""
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_stack import (load_reference_models, np_dcn_v2_forward,
                             restore_modules,
                             torch_dcn_v2_forward)  # noqa: E402
from test_composite_parity import _smooth_image  # noqa: E402

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))

GT, LR, BATCH = 64, 16, 2


@pytest.fixture(scope='module')
def ref_models():
    models, archs, saved = load_reference_models()
    yield models
    restore_modules(saved)


@pytest.fixture()
def one_device_mesh(monkeypatch):
    """Parity runs on a 1-device mesh: removes cross-device reduction
    order from the torch-vs-jax comparison."""
    from c2matching_tpu.models import base_model as bm
    from c2matching_tpu.parallel.mesh import get_mesh
    monkeypatch.setattr(bm, 'get_mesh',
                        lambda: get_mesh(jax.devices()[:1]))


# --------------------------------------------------------------------------
# the backward stub itself
# --------------------------------------------------------------------------

def _rand_dcn_case(seed, n=1, c=4, h=5, w=6, co=3, dg=2, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, c, h, w).astype(dtype)
    # fractional offsets away from integers: floor/validity boundaries are
    # measure-zero kinks where finite differences are ill-posed
    off = (rng.randint(-2, 3, (n, dg * 18, h, w))
           + rng.uniform(0.2, 0.8, (n, dg * 18, h, w))).astype(dtype)
    mask = rng.rand(n, dg * 9, h, w).astype(dtype)
    wgt = rng.randn(co, c, 3, 3).astype(dtype)
    b = rng.randn(co).astype(dtype)
    return x, off, mask, wgt, b, dg


@pytest.mark.fast
def test_torch_dcn_forward_matches_np_stub():
    """The differentiable torch transcription == the numpy _ext forward
    (which is itself pinned to the per-pixel CUDA-semantics oracle)."""
    x, off, mask, wgt, b, dg = _rand_dcn_case(0)
    want = np_dcn_v2_forward(x, wgt, b, off, mask, 3, 3, 1, 1, 1, 1, 1, 1,
                             dg)
    got = torch_dcn_v2_forward(
        torch.from_numpy(x), torch.from_numpy(wgt), torch.from_numpy(b),
        torch.from_numpy(off), torch.from_numpy(mask),
        3, 3, 1, 1, 1, 1, 1, 1, dg).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_dcn_backward_stub_gradcheck():
    """torch.autograd.gradcheck (float64) of the transcription the _ext
    backward stub differentiates — the gradcheck the reference's own
    DCNv2 README prescribes but never vendored (SURVEY.md §4)."""
    x, off, mask, wgt, b, dg = _rand_dcn_case(1, c=2, h=4, w=4, co=2,
                                              dtype=np.float64)
    leaves = [torch.from_numpy(t).requires_grad_(True)
              for t in (x, off, mask, wgt, b)]

    def fn(xx, oo, mm, ww, bb):
        return torch_dcn_v2_forward(xx, ww, bb, oo, mm,
                                    3, 3, 1, 1, 1, 1, 1, 1, dg)

    assert torch.autograd.gradcheck(fn, leaves, eps=1e-6, atol=1e-4)


@pytest.mark.fast
def test_dcn_backward_stub_matches_jax_grads():
    """Cross-framework gradient agreement: the _ext backward stub (what
    the reference stack trains through) == jax.grad of OUR production op
    for all five inputs, under the same cotangent."""
    from c2matching_tpu.ops.deform_conv import modulated_deform_conv

    rng = np.random.RandomState(2)
    h, w, c, g, cout = 6, 5, 8, 2, 4
    x = rng.randn(h, w, c).astype(np.float32)
    offset = (rng.randint(-2, 3, (h, w, g, 9, 2))
              + rng.uniform(0.2, 0.8, (h, w, g, 9, 2))).astype(np.float32)
    mask = rng.rand(h, w, g, 9).astype(np.float32)
    weight = rng.randn(9, c, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    cot = rng.randn(h, w, cout).astype(np.float32)

    def loss(x_, off_, m_, w_, b_):
        out = modulated_deform_conv(x_[None], off_[None], m_[None], w_, b_)
        return jnp.sum(out[0] * cot)

    gj = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias))

    # CUDA extension layouts (same conversion as the forward oracle test)
    x_cuda = x.transpose(2, 0, 1)[None]
    off_cuda = np.zeros((1, g * 18, h, w), np.float32)
    mask_cuda = np.zeros((1, g * 9, h, w), np.float32)
    for gi in range(g):
        for t in range(9):
            off_cuda[0, gi * 18 + 2 * t] = offset[:, :, gi, t, 0]
            off_cuda[0, gi * 18 + 2 * t + 1] = offset[:, :, gi, t, 1]
            mask_cuda[0, gi * 9 + t] = mask[:, :, gi, t]
    w_cuda = weight.transpose(2, 1, 0).reshape(cout, c, 3, 3)
    cot_cuda = cot.transpose(2, 0, 1)[None]

    import sys
    ext = sys.modules.get('_ext')
    if ext is None:
        from reference_stack import _make_ext_stub
        ext = _make_ext_stub()
    gt_x, gt_off, gt_mask, gt_w, gt_b = ext.dcn_v2_backward(
        torch.from_numpy(x_cuda), torch.from_numpy(w_cuda),
        torch.from_numpy(bias), torch.from_numpy(off_cuda),
        torch.from_numpy(mask_cuda), torch.from_numpy(cot_cuda),
        3, 3, 1, 1, 1, 1, 1, 1, g)

    np.testing.assert_allclose(np.asarray(gj[0]),
                               gt_x.numpy()[0].transpose(1, 2, 0),
                               rtol=1e-4, atol=1e-4)
    goff = np.asarray(gj[1])
    gmask = np.asarray(gj[2])
    for gi in range(g):
        for t in range(9):
            np.testing.assert_allclose(
                goff[:, :, gi, t, 0], gt_off.numpy()[0, gi * 18 + 2 * t],
                rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                goff[:, :, gi, t, 1],
                gt_off.numpy()[0, gi * 18 + 2 * t + 1],
                rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                gmask[:, :, gi, t], gt_mask.numpy()[0, gi * 9 + t],
                rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gj[3]),
        gt_w.numpy().transpose(2, 3, 1, 0).reshape(9, c, cout),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gj[4]), gt_b.numpy(),
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# shared stage-3 harness
# --------------------------------------------------------------------------

def _torch_opt_stage3(pretrain_steps):
    return {
        'is_train': True, 'dist': False, 'gpu_ids': None,
        'network_g': {'type': 'RestorationNet', 'ngf': 64, 'n_blocks': 16,
                      'groups': 8},
        'network_d': {'type': 'ImageDiscriminator', 'in_nc': 3, 'ndf': 32},
        'network_map': {'type': 'CorrespondenceGenerationArch',
                        'patch_size': 3, 'stride': 1,
                        'vgg_layer_list': ['relu1_1', 'relu2_1', 'relu3_1'],
                        'vgg_type': 'vgg19'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'strict_load': True},
        'train': {
            'lr_g': 1e-4, 'lr_offset': 1e-4, 'lr_relu2_offset': 1e-5,
            'lr_relu3_offset': 1e-6, 'weight_decay_g': 0,
            'beta_g': [0.9, 0.999], 'lr_d': 1e-4, 'weight_decay_d': 0,
            'beta_d': [0.9, 0.999], 'lr_scheme': 'MultiStepLR',
            'lr_steps': [10**9], 'lr_gamma': 0.1,
            'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
            'perceptual_opt': {
                'layer_weights': {'relu5_1': 1}, 'vgg_type': 'vgg19',
                'use_input_norm': True, 'perceptual_weight': 1e-4,
                'style_weight': 0, 'norm_img': False, 'criterion': 'fro'},
            'gan_type': 'wgan', 'gan_weight': 1e-6,
            'grad_penalty_weight': 10.0,
            'net_g_pretrain_steps': pretrain_steps, 'net_d_steps': 1,
            'net_d_init_steps': 0,
        },
    }


def _stage3_batches(n_steps, seed=7):
    rng = np.random.RandomState(seed)
    from c2matching_tpu.data.util import imresize_np
    batches = []
    for _ in range(n_steps):
        gt = np.stack([_smooth_image(rng, GT, GT) for _ in range(BATCH)])
        lq = np.stack([_smooth_image(rng, LR, LR) for _ in range(BATCH)])
        ref = np.stack([_smooth_image(rng, GT, GT) for _ in range(BATCH)])
        up = np.stack([imresize_np(im, 4.).astype(np.float32) for im in lq])
        batches.append({'img_in': gt, 'img_in_lq': lq, 'img_in_up': up,
                        'img_ref': ref})
    return batches


def _to_torch(batch):
    return {k: torch.from_numpy(v.transpose(0, 3, 1, 2).copy())
            for k, v in batch.items()}


def _sd_to_pth(module, path):
    torch.save(module.state_dict(), path)
    return str(path)


def _flat_norm(tree_a, tree_b):
    leaves_a = jax.tree.leaves(tree_a)
    leaves_b = jax.tree.leaves(tree_b)
    sq = sum(float(np.sum((np.asarray(a, np.float64)
                           - np.asarray(b, np.float64))**2))
             for a, b in zip(leaves_a, leaves_b))
    return float(np.sqrt(sq))


def _tree_max_abs_delta(tree_a, tree_b):
    return max(float(np.max(np.abs(np.asarray(a, np.float32)
                                   - np.asarray(b, np.float32))))
               for a, b in zip(jax.tree.leaves(tree_a),
                               jax.tree.leaves(tree_b)))


def _build_torch_stage3(ref_models, pretrain_steps, tmp_path, seed=0,
                        train_overrides=None):
    """Construct the reference RefRestorationModel on CPU with seeded
    weights, perturb the zero-init offset convs (so the DCN offset path
    carries real gradients from step 1), export every weight our side
    must share."""
    torch.manual_seed(seed)
    opt = _torch_opt_stage3(pretrain_steps)
    opt['train'].update(train_overrides or {})
    model = ref_models['ref_restoration'].RefRestorationModel(opt)
    net_g = model.net_g.module
    with torch.no_grad():
        dyn = net_g.dyn_agg_restore
        for mod in (dyn.small_dyn_agg, dyn.medium_dyn_agg,
                    dyn.large_dyn_agg):
            mod.conv_offset_mask.weight.normal_(0, 0.005)
            mod.conv_offset_mask.bias.uniform_(-0.3, 0.3)
    paths = {
        'g': _sd_to_pth(model.net_g, tmp_path / 'net_g.pth'),
        'd': _sd_to_pth(model.net_d, tmp_path / 'net_d.pth'),
        'ext': _sd_to_pth(model.net_extractor, tmp_path / 'net_ext.pth'),
        'cg': _sd_to_pth(model.net_map, tmp_path / 'net_map.pth'),
        'percep': _sd_to_pth(model.cri_perceptual,
                             tmp_path / 'percep.pth'),
    }
    return model, paths


def _build_jax_stage3(paths, pretrain_steps, tmp_path, monkeypatch,
                      train_overrides=None):
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    from c2matching_tpu.utils.pth_import import import_corres_generation

    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = parse(osp.join(REPO, 'options', 'train',
                         'debug_stage3_synth.yml'), is_train=True)
    opt['name'] = 'train_parity_stage3'
    opt['path']['pretrain_model_g'] = paths['g']
    opt['path']['pretrain_model_d'] = paths['d']
    opt['path']['pretrain_model_feature_extractor'] = paths['ext']
    opt['train']['net_g_pretrain_steps'] = pretrain_steps
    opt['train'].update(train_overrides or {})
    model = create_model(dict_to_nonedict(opt))
    # the two frozen VGGs the opt paths don't carry: the matcher's VGG19
    # (inside net_map) and the perceptual VGG19 — both state dicts use
    # the same 'vgg.vgg_net.<name>' prefix import_corres_generation maps
    model.vars_map = model.replicate(jax.tree.map(
        jnp.asarray, import_corres_generation(paths['cg'])))
    model.vars_perceptual = model.replicate(model.merge_loaded(
        model.vars_perceptual, import_corres_generation(paths['percep'])))
    return model


def _assert_logs_match(logs_t, logs_j, tolerances, context):
    for step, (lt, lj) in enumerate(zip(logs_t, logs_j), start=1):
        tol = tolerances[min(step - 1, len(tolerances) - 1)]
        for k, vt in lt.items():
            assert k in lj, f'{context} step {step}: missing log {k}'
            vj = lj[k]
            assert np.isfinite(vj), (context, step, k, vj)
            assert abs(vj - vt) <= tol * max(1.0, abs(vt)), (
                f'{context} step {step} loss {k}: jax {vj} vs torch {vt} '
                f'(tol {tol})')


# --------------------------------------------------------------------------
# stage 3
# --------------------------------------------------------------------------

@pytest.mark.proof
def test_stage3_pretrain_train_parity(ref_models, tmp_path, monkeypatch,
                                      one_device_mesh):
    """3 G-pretrain steps (L1 only) both ways: per-step l_pix, then
    elementwise + delta-norm parameter agreement."""
    from c2matching_tpu.utils.pth_import import import_restoration_net

    n_steps = 3
    ref, paths = _build_torch_stage3(ref_models, pretrain_steps=10,
                                     tmp_path=tmp_path)
    init_params = import_restoration_net(paths['g'])['params']
    model = _build_jax_stage3(paths, pretrain_steps=10, tmp_path=tmp_path,
                              monkeypatch=monkeypatch)
    batches = _stage3_batches(n_steps)

    logs_t = []
    for i, b in enumerate(batches, start=1):
        ref.feed_data(_to_torch(b))
        ref.optimize_parameters(i)
        logs_t.append({k: float(v) for k, v in ref.log_dict.items()})

    logs_j = []
    for i, b in enumerate(batches, start=1):
        model.feed_data(b)
        model.optimize_parameters(i)
        logs_j.append({k: float(v) for k, v in model.log_dict.items()
                       if not k.startswith('offset_absmean')})

    _assert_logs_match(logs_t, logs_j, tolerances=[2e-3, 5e-3, 1e-2],
                       context='stage3-pretrain')

    final_t = import_restoration_net(
        _sd_to_pth(ref.net_g, tmp_path / 'net_g_final.pth'))['params']
    final_j = jax.device_get(model.vars_g['params'])
    # Adam moves each leaf by <= ~lr/step (lr <= 1e-4 for every group);
    # sign flips of near-zero grads bound the elementwise disagreement
    max_delta = _tree_max_abs_delta(final_j, final_t)
    assert max_delta <= 2.2e-4 * n_steps, max_delta
    # and the overall update the two frameworks computed must be the
    # same vector up to a small relative residual
    denom = _flat_norm(final_t, init_params)
    resid = _flat_norm(final_j, final_t) / max(denom, 1e-12)
    assert resid < 0.15, (resid, denom)


@pytest.mark.proof
def test_stage3_gan_train_parity(ref_models, tmp_path, monkeypatch,
                                 one_device_mesh):
    """2 full GAN iterations both ways (D WGAN-GP update + G update
    against the updated D), identical per-step GP alphas; pins every
    D- and G-side loss and both nets' parameter deltas.

    The torch side trains literally through ``_ext.dcn_v2_backward`` —
    the numpy/autograd stand-in for dcn_v2_cuda.cu:206-335."""
    from c2matching_tpu.models import losses as jlosses
    from c2matching_tpu.models import ref_restoration_model as rrm
    from c2matching_tpu.utils.pth_import import (import_discriminator,
                                                 import_restoration_net)

    n_steps = 2
    ref, paths = _build_torch_stage3(ref_models, pretrain_steps=0,
                                     tmp_path=tmp_path)
    init_g = import_restoration_net(paths['g'])['params']
    init_d = import_discriminator(paths['d'])['params']
    model = _build_jax_stage3(paths, pretrain_steps=0, tmp_path=tmp_path,
                              monkeypatch=monkeypatch)
    batches = _stage3_batches(n_steps, seed=11)
    rng = np.random.RandomState(23)
    alphas = [rng.uniform(size=(BATCH, 1, 1, 1)).astype(np.float32)
              for _ in range(n_steps)]

    # --- torch: pin GP's torch.rand to the shared alphas
    logs_t = []
    alpha_queue = list(alphas)
    with pytest.MonkeyPatch.context() as mp:
        def fake_rand(*size, **kw):
            assert tuple(size) == (BATCH, 1, 1, 1), size
            return torch.from_numpy(alpha_queue.pop(0))

        mp.setattr(torch, 'rand', fake_rand)
        for i, b in enumerate(batches, start=1):
            ref.feed_data(_to_torch(b))
            ref.optimize_parameters(i)
            logs_t.append({k: float(v) for k, v in ref.log_dict.items()})
    assert not alpha_queue  # exactly one GP draw per step

    # --- jax: same alphas through the (donated) fused step's rng slot
    def pinned_gp(disc_fn, real, fake, key, loss_weight=1.0):
        return jlosses.gradient_penalty_loss(disc_fn, real, fake, None,
                                             loss_weight, alpha=key)

    monkeypatch.setattr(rrm, 'gradient_penalty_loss', pinned_gp)
    logs_j = []
    for i, (b, a) in enumerate(zip(batches, alphas), start=1):
        model.feed_data(b)
        (params, model.opt_state_g, model.vars_d, model.opt_state_d,
         _fake, logs) = model._gan_step(
            model.vars_g['params'], model.opt_state_g, model.vars_d,
            model.opt_state_d, model.vars_extractor, model.vars_map,
            model.batch, model.vars_perceptual, jnp.asarray(a), do_g=True)
        model.vars_g = dict(model.vars_g, params=params)
        logs_j.append({k: float(v) for k, v in logs.items()
                       if not k.startswith('offset_absmean')})

    _assert_logs_match(logs_t, logs_j, tolerances=[5e-3, 2e-2],
                       context='stage3-gan')

    final_g_t = import_restoration_net(
        _sd_to_pth(ref.net_g, tmp_path / 'net_g_final.pth'))['params']
    final_d_t = import_discriminator(
        _sd_to_pth(ref.net_d, tmp_path / 'net_d_final.pth'))['params']
    final_g_j = jax.device_get(model.vars_g['params'])
    final_d_j = jax.device_get(model.vars_d['params'])

    assert _tree_max_abs_delta(final_g_j, final_g_t) <= 2.2e-4 * n_steps
    assert _tree_max_abs_delta(final_d_j, final_d_t) <= 2.2e-4 * n_steps
    for final_j, final_t, init in ((final_g_j, final_g_t, init_g),
                                   (final_d_j, final_d_t, init_d)):
        denom = _flat_norm(final_t, init)
        resid = _flat_norm(final_j, final_t) / max(denom, 1e-12)
        assert resid < 0.2, (resid, denom)


@pytest.mark.proof
def test_stage3_schedule_boundary_trajectory(ref_models, tmp_path,
                                             monkeypatch, one_device_mesh):
    """Trajectory-level parity across every stage-3 schedule boundary in
    one run (VERDICT r4 item 1): 13 iterations in both frameworks under
    a schedule that crosses, inside the window,

    - the net_g_pretrain_steps->GAN transition (3->4,
      ref_restoration_model.py:199-209),
    - a net_d_init_steps=2 D-only window AND the net_d_steps=2 cadence
      (:241-242 — D-only at iterations 4,5,6,8,10,12; G+D at 7,9,11,13),
    - a MultiStepRestartLR restart (restarts=[6], weight 0.5 — D's LR
      halves from iteration 7) and an lr_steps=[9] milestone (D decays
      from iteration 10, lr_scheduler.py:7-47).

    The restart/milestone apply to the DISCRIMINATOR only: upstream
    stage 3 schedules nothing else (optimizer_g is appended after
    setup_schedulers already ran — see
    RefRestorationModel.init_training_settings here), so this test also
    pins G's four groups CONSTANT at their base LRs on both sides,
    through the same boundaries. (Warmup cannot be crossed in stage 3 —
    any warmup_iter > 0 CRASHES the reference there, KeyError
    'initial_lr' in base_model.py:169; the warmup ramp boundary is
    pinned cross-framework in stage 1 instead,
    test_stage1_warmup_schedule_trajectory.)

    The torch side is driven exactly as the reference train loop does
    (update_learning_rate(i, warmup) then optimize_parameters(i),
    train.py:150-154); OUR side runs its production optimize_parameters
    wiring unmodified — the GP alphas torch consumes are predicted from
    our model's own rng stream, so no jax-side pinning is needed.

    Pinned per iteration: the live LR of all 5 param groups (D's vs our
    closed-form schedule, G's vs the constant bases, exact), the fresh
    log-key SET (phase-gating parity, exact), and every loss value
    (growing f32 tolerance). After the run: D's schedule count equals
    the iteration count (the shift_schedule_count sync end-to-end), G's
    optimizer state carries NO schedule state at all (the faithful
    default), and G/D param deltas are elementwise-bounded with small
    relative residuals."""
    from c2matching_tpu.utils.pth_import import (import_discriminator,
                                                 import_restoration_net)

    P, n_iters = 3, 13
    overrides = {
        'lr_scheme': 'MultiStepRestartLR', 'lr_steps': [9],
        'lr_gamma': 0.1, 'restarts': [6], 'restart_weights': [0.5],
        'net_d_steps': 2, 'net_d_init_steps': 2,
    }
    ref, paths = _build_torch_stage3(ref_models, pretrain_steps=P,
                                     tmp_path=tmp_path,
                                     train_overrides=overrides)
    init_g = import_restoration_net(paths['g'])['params']
    init_d = import_discriminator(paths['d'])['params']
    model = _build_jax_stage3(paths, pretrain_steps=P, tmp_path=tmp_path,
                              monkeypatch=monkeypatch,
                              train_overrides=overrides)
    batches = _stage3_batches(n_iters, seed=17)

    # predict the GP alphas our production wiring will draw (one rng
    # split per post-pretrain iteration, uniform inside
    # gradient_penalty_loss) and feed the SAME values to torch.rand
    rng = model._rng
    alphas = []
    for _ in range(P, n_iters):
        rng, sub = jax.random.split(rng)
        alphas.append(np.asarray(
            jax.random.uniform(sub, (BATCH, 1, 1, 1), jnp.float32)))

    # --- torch trajectory (reference train-loop wiring)
    logs_t, lrs_t = [], []
    alpha_queue = list(alphas)
    with pytest.MonkeyPatch.context() as mp:
        def fake_rand(*size, **kw):
            assert tuple(size) == (BATCH, 1, 1, 1), size
            return torch.from_numpy(alpha_queue.pop(0))

        mp.setattr(torch, 'rand', fake_rand)
        for i, b in enumerate(batches, start=1):
            ref.update_learning_rate(i, warmup_iter=-1)
            ref.log_dict = type(ref.log_dict)()
            ref.feed_data(_to_torch(b))
            ref.optimize_parameters(i)
            logs_t.append({k: float(v) for k, v in ref.log_dict.items()})
            # upstream: optimizers == [optimizer_d, optimizer_g], so
            # get_current_learning_rate() reports D's (sole scheduled)
            # group; optimizer_g's 4 groups are read directly
            lrs_t.append((list(ref.get_current_learning_rate()),
                          [g['lr'] for g in
                           ref.optimizer_g.param_groups]))
    assert not alpha_queue  # exactly one GP draw per GAN iteration

    # --- LR trajectory: D follows the closed-form schedule (restart at
    # 7, milestone decay at 10); G's four groups NEVER move (same order
    # as base_lrs: [g, offset, relu3, relu2]) — and our own
    # current_learning_rates mirror says exactly the same
    g_bases = model.base_lrs()[:4]
    for i, (d_lrs, g_lrs) in enumerate(lrs_t, start=1):
        want_d = float(model.schedule_fn(i - 1, model.base_lrs()[4]))
        np.testing.assert_allclose(d_lrs, [want_d], rtol=1e-6,
                                   err_msg=f'iteration {i} (D)')
        np.testing.assert_allclose(g_lrs, g_bases, rtol=0,
                                   err_msg=f'iteration {i} (G)')
        np.testing.assert_allclose(model.current_learning_rates(i - 1),
                                   g_bases + [want_d], rtol=1e-6,
                                   err_msg=f'iteration {i} (mirror)')
    assert lrs_t[6][0][0] == pytest.approx(0.5 * model.base_lrs()[4])
    assert lrs_t[9][0][0] == pytest.approx(0.05 * model.base_lrs()[4])

    # --- our trajectory (production wiring, untouched)
    logs_j = []
    for i, b in enumerate(batches, start=1):
        model.feed_data(b)
        model.optimize_parameters(i)
        logs_j.append({k: float(v) for k, v in model.log_dict.items()
                       if not k.startswith('offset_absmean')})

    # phase-gating parity: identical fresh-key sets at every iteration
    # (l_pix only in pretrain; D losses from 4; G losses exactly on
    # 7/9/11/13)
    for i, (lt, lj) in enumerate(zip(logs_t, logs_j), start=1):
        assert set(lt) == set(lj), (i, set(lt) ^ set(lj))
    assert set(logs_t[0]) == {'l_pix'}
    assert 'l_g_pix' not in logs_t[5] and 'l_d_real' in logs_t[5]
    assert 'l_g_pix' in logs_t[6]

    # f32 reassociation noise compounds through Adam's ~sign(g) updates;
    # tolerance grows with the step index (same mechanism the 2-3-step
    # tests bound, over a longer window)
    tols = [min(2e-3 * 2.0 ** (i - 1), 0.25) for i in range(1, n_iters + 1)]
    _assert_logs_match(logs_t, logs_j, tolerances=tols,
                       context='stage3-trajectory')

    # D's schedule count advanced once per ITERATION (10 updates + the
    # pretrain-phase shift of 3 — shift_schedule_count keeps milestones
    # absolute); G's optimizer state has NO schedule state at all (the
    # reference-faithful default: G is unscheduled in stage 3)
    import optax

    def _counts(state):
        return [int(leaf.count) for leaf in jax.tree.leaves(
            state,
            is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))
            if isinstance(leaf, optax.ScaleByScheduleState)]

    assert _counts(model.opt_state_g) == []
    assert _counts(model.opt_state_d) == [n_iters]

    # --- final parameters: bounded by per-net UPDATE counts (G: 3
    # pretrain + 4 GAN updates; D: 10 updates), lr <= 1e-4 per group
    final_g_t = import_restoration_net(
        _sd_to_pth(ref.net_g, tmp_path / 'net_g_final.pth'))['params']
    final_d_t = import_discriminator(
        _sd_to_pth(ref.net_d, tmp_path / 'net_d_final.pth'))['params']
    final_g_j = jax.device_get(model.vars_g['params'])
    final_d_j = jax.device_get(model.vars_d['params'])
    assert _tree_max_abs_delta(final_g_j, final_g_t) <= 2.2e-4 * 7
    assert _tree_max_abs_delta(final_d_j, final_d_t) <= 2.2e-4 * 10
    for final_j, final_t, init in ((final_g_j, final_g_t, init_g),
                                   (final_d_j, final_d_t, init_d)):
        denom = _flat_norm(final_t, init)
        resid = _flat_norm(final_j, final_t) / max(denom, 1e-12)
        assert resid < 0.3, (resid, denom)


# --------------------------------------------------------------------------
# stages 1 / 2
# --------------------------------------------------------------------------

def _contras_batches(n_steps, with_up, seed=3, gt=160, batch=2):
    """Homography training pairs built with the framework's own dataset
    helpers on smooth synthetic images (deterministic; identical arrays
    feed both frameworks)."""
    from c2matching_tpu.data.contras_dataset import (
        image_pair_generation, transformed_coordinate_grid)
    from c2matching_tpu.data.transforms import to_rgb_hwc
    from c2matching_tpu.data.util import pil_chain_lq_up

    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        items = {'img_in': [], 'img_ref': [], 'transformed_coordinate': [],
                 'img_in_up': []}
        for _b in range(batch):
            # mirror ContrasDataset.__getitem__: full gt_size image, a
            # near-identity jittered-corner homography over it
            # (contras_dataset.py:165-172)
            img_in = _smooth_image(rng, gt, gt)
            img_tr, _h, h_inv = image_pair_generation(
                img_in, (0, 10), cropping_window_size=gt, rng=rng)
            coords = transformed_coordinate_grid(h_inv, gt, gt)
            _lq, img_up = pil_chain_lq_up(img_in, 4)
            rgb = to_rgb_hwc([img_in, img_tr, img_up])
            items['img_in'].append(rgb[0])
            items['img_ref'].append(rgb[1])
            items['img_in_up'].append(rgb[2])
            items['transformed_coordinate'].append(coords)
        b = {k: np.stack(v).astype(np.float32) for k, v in items.items()}
        if not with_up:
            b.pop('img_in_up')
        batches.append(b)
    return batches


def _contras_to_torch(batch):
    out = {}
    for k, v in batch.items():
        if k == 'transformed_coordinate':
            out[k] = torch.from_numpy(v.copy())
        else:
            out[k] = torch.from_numpy(v.transpose(0, 3, 1, 2).copy())
    return out


def _contras_train_opt():
    return {'lr_g': 1e-3, 'lr_scheme': 'MultiStepLR', 'lr_steps': [10**9],
            'lr_gamma': 0.1, 'margin': 1.0, 'safe_radius': 4,
            'scaling_steps': 2}


def test_stage1_teacher_train_parity(ref_models, tmp_path, monkeypatch,
                                     one_device_mesh):
    """3 teacher triplet steps both ways: loss/pos_dist/neg_dist per
    step + parameter agreement."""
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    from c2matching_tpu.utils.pth_import import import_contras_extractor

    n_steps = 3
    torch.manual_seed(4)
    opt_t = {'is_train': True, 'dist': False, 'gpu_ids': None,
             'network_g': {'type': 'ContrasExtractorSep'},
             'path': {'strict_load': True},
             'train': _contras_train_opt()}
    ref = ref_models['teacher'].TeacherContrasModel(opt_t)
    g_pth = _sd_to_pth(ref.net_g, tmp_path / 'net_g.pth')
    init_params = import_contras_extractor(g_pth)['params']

    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = parse(osp.join(REPO, 'options', 'train',
                         'debug_stage1_synth.yml'), is_train=True)
    opt['name'] = 'train_parity_stage1'
    opt['path']['pretrain_model_g'] = g_pth
    opt['train']['lr_steps'] = [10**9]
    opt['train']['lr_gamma'] = 0.1
    model = create_model(dict_to_nonedict(opt))

    batches = _contras_batches(n_steps, with_up=False)
    logs_t, logs_j = [], []
    for i, b in enumerate(batches, start=1):
        ref.feed_data(_contras_to_torch(b))
        ref.optimize_parameters(i)
        logs_t.append({k: float(v) for k, v in ref.log_dict.items()})
    for i, b in enumerate(batches, start=1):
        model.feed_data(b)
        model.optimize_parameters(i)
        logs_j.append({k: float(v) for k, v in model.log_dict.items()
                       if k != 'n_valid'})

    _assert_logs_match(logs_t, logs_j, tolerances=[1e-3, 3e-3, 1e-2],
                       context='stage1')

    final_t = import_contras_extractor(
        _sd_to_pth(ref.net_g, tmp_path / 'net_g_final.pth'))['params']
    final_j = jax.device_get(model.vars_g['params'])
    assert _tree_max_abs_delta(final_j, final_t) <= 2.2e-3 * n_steps
    denom = _flat_norm(final_t, init_params)
    assert _flat_norm(final_j, final_t) / max(denom, 1e-12) < 0.15


def test_stage2_student_train_parity(ref_models, tmp_path, monkeypatch,
                                     one_device_mesh):
    """3 student distillation steps both ways (triplet + temperature-KL
    against the frozen teacher)."""
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    from c2matching_tpu.utils.pth_import import import_contras_extractor

    n_steps = 3
    torch.manual_seed(5)
    train = dict(_contras_train_opt(), distill_weight=15.0,
                 temperature=0.15)
    opt_t = {'is_train': True, 'dist': False, 'gpu_ids': None,
             'network_student': {'type': 'ContrasExtractorSep'},
             'network_teacher': {'type': 'ContrasExtractorSep'},
             'path': {'strict_load': True},
             'train': train}
    ref = ref_models['student'].StudentContrasDistillationModel(opt_t)
    s_pth = _sd_to_pth(ref.net_student, tmp_path / 'net_student.pth')
    t_pth = _sd_to_pth(ref.net_teacher, tmp_path / 'net_teacher.pth')
    init_params = import_contras_extractor(s_pth)['params']

    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = parse(osp.join(REPO, 'options', 'train',
                         'debug_stage2_synth.yml'), is_train=True)
    opt['name'] = 'train_parity_stage2'
    opt['path']['pretrain_model_student'] = s_pth
    opt['path']['pretrain_model_teacher'] = t_pth
    opt['train']['lr_steps'] = [10**9]
    model = create_model(dict_to_nonedict(opt))

    batches = _contras_batches(n_steps, with_up=True, seed=9)
    logs_t, logs_j = [], []
    for i, b in enumerate(batches, start=1):
        ref.feed_data(_contras_to_torch(b))
        ref.optimize_parameters(i)
        logs_t.append({k: float(v) for k, v in ref.log_dict.items()})
    for i, b in enumerate(batches, start=1):
        model.feed_data(b)
        model.optimize_parameters(i)
        logs_j.append({k: float(v) for k, v in model.log_dict.items()
                       if k != 'n_valid'})

    _assert_logs_match(logs_t, logs_j, tolerances=[1e-3, 3e-3, 1e-2],
                       context='stage2')

    final_t = import_contras_extractor(
        _sd_to_pth(ref.net_student, tmp_path / 'net_student_final.pth')
    )['params']
    final_j = jax.device_get(model.vars_student['params'])
    assert _tree_max_abs_delta(final_j, final_t) <= 2.2e-3 * n_steps
    denom = _flat_norm(final_t, init_params)
    assert _flat_norm(final_j, final_t) / max(denom, 1e-12) < 0.15


def test_stage1_warmup_schedule_trajectory(ref_models, tmp_path,
                                           monkeypatch, one_device_mesh):
    """Warmup-ramp + restart + milestone crossing in one stage-1 run
    (VERDICT r4 item 1, the warmup half — stage 3 cannot run warmup
    upstream at all, see test_stage3_schedule_boundary_trajectory).

    9 teacher iterations in both frameworks under warmup_iter=4 (linear
    ramp over iterations 1-3, base_model.py:155-177), a
    MultiStepRestartLR restart at 3 with weight 0.5 (the restart lands
    exactly at the ramp end, so the reference's multiplicative
    scheduler — whose warmup overwrite otherwise freezes the last ramp
    value, the documented quirk in
    c2matching_tpu/models/lr_scheduler.py:116-124 — and our closed form
    leave warmup on the SAME lr: 0.5*base from iteration 4), and an
    lr_steps=[6] milestone (decay from iteration 7). Expected LR
    trajectory (base 1e-3): 2.5e-4, 5e-4, 7.5e-4, then 5e-4 x3, then
    5e-5 x3.

    The torch side runs the reference train-loop wiring
    (update_learning_rate(i, warmup_iter=4) then optimize_parameters,
    train.py:150-154); ours runs production optimize_parameters with
    the schedule inside optax. Pinned: per-iteration live LR (exact),
    every loss (growing f32 tolerance), the final schedule count, and
    final parameter agreement."""
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    from c2matching_tpu.utils.pth_import import import_contras_extractor

    n_iters, W = 9, 4
    sched_opt = {'lr_scheme': 'MultiStepRestartLR', 'lr_steps': [6],
                 'lr_gamma': 0.1, 'restarts': [3],
                 'restart_weights': [0.5], 'warmup_iter': W}
    torch.manual_seed(6)
    opt_t = {'is_train': True, 'dist': False, 'gpu_ids': None,
             'network_g': {'type': 'ContrasExtractorSep'},
             'path': {'strict_load': True},
             'train': dict(_contras_train_opt(), **sched_opt)}
    ref = ref_models['teacher'].TeacherContrasModel(opt_t)
    g_pth = _sd_to_pth(ref.net_g, tmp_path / 'net_g.pth')
    init_params = import_contras_extractor(g_pth)['params']

    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = parse(osp.join(REPO, 'options', 'train',
                         'debug_stage1_synth.yml'), is_train=True)
    opt['name'] = 'warmup_trajectory_stage1'
    opt['path']['pretrain_model_g'] = g_pth
    opt['train'].update(sched_opt)
    model = create_model(dict_to_nonedict(opt))

    batches = _contras_batches(n_iters, with_up=False, seed=21)
    base_lr = opt_t['train']['lr_g']
    want_lrs = [base_lr * 1 / 4, base_lr * 2 / 4, base_lr * 3 / 4,
                base_lr * .5, base_lr * .5, base_lr * .5,
                base_lr * .05, base_lr * .05, base_lr * .05]

    logs_t, logs_j = [], []
    for i, b in enumerate(batches, start=1):
        ref.update_learning_rate(i, warmup_iter=W)
        got = ref.get_current_learning_rate()
        np.testing.assert_allclose(got, [want_lrs[i - 1]], rtol=1e-6,
                                   err_msg=f'iteration {i} (torch lr)')
        ref.log_dict = type(ref.log_dict)()
        ref.feed_data(_contras_to_torch(b))
        ref.optimize_parameters(i)
        logs_t.append({k: float(v) for k, v in ref.log_dict.items()})
    for i, b in enumerate(batches, start=1):
        np.testing.assert_allclose(
            model.current_learning_rates(i - 1), [want_lrs[i - 1]],
            rtol=1e-6, err_msg=f'iteration {i} (jax lr)')
        model.feed_data(b)
        model.optimize_parameters(i)
        logs_j.append({k: float(v) for k, v in model.log_dict.items()
                       if k != 'n_valid'})

    tols = [min(1e-3 * 2.0 ** (i - 1), 0.15) for i in range(1, n_iters + 1)]
    _assert_logs_match(logs_t, logs_j, tolerances=tols, context='stage1-warmup')

    import optax
    counts = [int(leaf.count) for leaf in jax.tree.leaves(
        model.opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))
        if isinstance(leaf, optax.ScaleByScheduleState)]
    assert counts == [n_iters]

    final_t = import_contras_extractor(
        _sd_to_pth(ref.net_g, tmp_path / 'net_g_final.pth'))['params']
    final_j = jax.device_get(model.vars_g['params'])
    # per-update move bounded by the largest scheduled lr (7.5e-4)
    assert _tree_max_abs_delta(final_j, final_t) <= 1.7e-3 * n_iters
    denom = _flat_norm(final_t, init_params)
    assert _flat_norm(final_j, final_t) / max(denom, 1e-12) < 0.3
