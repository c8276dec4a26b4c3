"""Stage-model tests: contrastive losses vs a torch-style oracle, teacher
train step, stage-3 MSE train step, checkpoint round trip (CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_style_triplet(feat1, feat2, coords, margin=1.0, safe_radius=4,
                         scaling_steps=2):
    """numpy re-derivation of teacher_contras_model.loss_function
    (:115-210) for one sample; feats (h, w, c), coords (H, W, 3)."""
    h1, w1, c = feat1.shape
    n = h1 * w1
    scale = 2 ** scaling_steps

    d1_all = feat1.reshape(n, c)
    d1_all = d1_all / np.maximum(
        np.linalg.norm(d1_all, axis=1, keepdims=True), 1e-12)

    fmap_pos1 = np.stack(np.meshgrid(np.arange(h1), np.arange(w1),
                                     indexing='ij'), 0).reshape(2, -1)
    pos2 = coords[::scale, ::scale, :2].reshape(-1, 2)  # (n, 2) (x, y)
    max_w, max_h = scale * w1, scale * h1
    valid = ((pos2[:, 0] > 10) & (pos2[:, 0] < max_w - 10)
             & (pos2[:, 1] > 10) & (pos2[:, 1] < max_h - 10))
    ids = np.where(valid)[0]
    if len(ids) < 128:
        return None

    fpos1 = fmap_pos1[:, ids].astype(np.float64)
    d1 = d1_all[ids]
    fpos2 = np.round(pos2[ids][:, [1, 0]].astype(np.float64) / scale)
    fpos2_i = np.clip(fpos2.astype(int), 0, [h1 - 1, w1 - 1])
    d2 = feat2.reshape(n, c)[fpos2_i[:, 0] * w1 + fpos2_i[:, 1]]
    d2 = d2 / np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), 1e-12)

    pos_dist = 2 - 2 * np.sum(d1 * d2, axis=1)

    pd2 = np.max(np.abs(fpos2[:, None, :] - fpos2[None, :, :]), axis=-1)
    dist2 = 2 - 2 * d1 @ d2.T + (pd2 <= safe_radius) * 10.0
    neg2 = dist2.min(axis=1)

    pd1 = np.max(np.abs(fpos1.T[:, None, :] -
                        fmap_pos1.T[None, :, :]), axis=-1)
    dist1 = 2 - 2 * d2 @ d1_all.T + (pd1 <= safe_radius) * 10.0
    neg1 = dist1.min(axis=1)

    diff = pos_dist - np.minimum(neg1, neg2)
    return (np.maximum(margin + diff, 0).mean(), pos_dist.mean(),
            np.minimum(neg1, neg2).mean())


def test_triplet_loss_matches_oracle():
    import jax.numpy as jnp
    from c2matching_tpu.models.contras_losses import triplet_loss_batch

    rng = np.random.RandomState(0)
    h = w = 24
    feat1 = rng.randn(2, h, w, 16).astype(np.float32)
    feat2 = rng.randn(2, h, w, 16).astype(np.float32)
    # identity-ish homography grid: coords (x, y) = pixel + small jitter
    gx, gy = np.meshgrid(np.arange(4 * w), np.arange(4 * h))
    coords = np.stack([gx, gy, np.ones_like(gx)], -1).astype(np.float32)
    coords = np.stack([coords, coords])
    coords[..., :2] += rng.randn(*coords[..., :2].shape) * 0.3

    loss, pos, neg, n_ok = triplet_loss_batch(
        jnp.asarray(feat1), jnp.asarray(feat2), jnp.asarray(coords))

    oracle = [
        _torch_style_triplet(feat1[i], feat2[i], coords[i])
        for i in range(2)
    ]
    oracle = [o for o in oracle if o is not None]
    assert int(n_ok) == len(oracle)
    exp_loss = np.mean([o[0] for o in oracle])
    exp_pos = np.mean([o[1] for o in oracle])
    exp_neg = np.mean([o[2] for o in oracle])
    np.testing.assert_allclose(float(loss), exp_loss, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(pos), exp_pos, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(neg), exp_neg, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synthdata_models')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '4', '--size', '64'],
        check=True)
    return str(root)


def _mini_opt(root, tmp, model_type, gt_size=64):
    opt = {
        'name': 'unittest', 'is_train': True, 'model_type': model_type,
        'scale': 4, 'crop_border': 4, 'manual_seed': 0,
        'datasets': {'train': {
            'name': 'synth', 'phase': 'train', 'scale': 4,
            'type': 'RefCUFEDDataset', 'gt_size': gt_size,
            'use_flip': False, 'use_rot': False,
            'dataroot_in': os.path.join(root, 'input'),
            'dataroot_ref': os.path.join(root, 'ref'),
            'io_backend': {'type': 'disk'},
            'ann_file': os.path.join(root, 'pairs.txt'),
            'batch_size': 2,
        }},
        'network_g': {'type': 'ContrasExtractorSep'},
        'path': {'models': os.path.join(tmp, 'models'),
                 'training_state': os.path.join(tmp, 'training_state')},
        'train': {'lr_g': 1e-3, 'lr_scheme': 'MultiStepLR', 'niter': 10,
                  'warmup_iter': -1, 'lr_steps': [], 'lr_gamma': 0.1,
                  'margin': 1.0, 'safe_radius': 4, 'scaling_steps': 2},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 1000},
    }
    from c2matching_tpu.utils import dict_to_nonedict
    return dict_to_nonedict(opt)


def test_teacher_train_step_and_checkpoint(synth_root, tmp_path):
    from c2matching_tpu.data import create_dataset, DataLoader
    from c2matching_tpu.models import create_model

    # gt_size 160 so each sample has >= 128 valid correspondences
    opt = _mini_opt(synth_root, str(tmp_path), 'TeacherContrasModel',
                    gt_size=160)
    opt['datasets']['train']['type'] = 'ContrasDataset'
    ds = create_dataset(opt['datasets']['train'])
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    model = create_model(opt)

    batch = next(iter(loader))
    model.feed_data(batch)
    model.optimize_parameters(1)
    assert np.isfinite(model.log_dict['loss'])
    loss1 = model.log_dict['loss']
    model.feed_data(batch)
    model.optimize_parameters(2)
    # training on the same batch should reduce (or at least change) loss
    assert model.log_dict['loss'] != loss1

    model.save(epoch=0, current_iter=2)
    assert os.path.exists(
        os.path.join(str(tmp_path), 'models', 'net_g_2.ckpt'))
    assert os.path.exists(
        os.path.join(str(tmp_path), 'models', 'net_g_latest.ckpt'))
    assert os.path.exists(
        os.path.join(str(tmp_path), 'training_state', '2.state'))

    # round-trip: load the checkpoint back into a fresh model
    import jax
    loaded = model.load_network(
        os.path.join(str(tmp_path), 'models', 'net_g_2.ckpt'), 'extractor')
    merged = model.merge_loaded(jax.device_get(model.vars_g), loaded)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(jax.device_get(model.vars_g))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    epoch, it = model.resume_training(
        os.path.join(str(tmp_path), 'training_state', '2.state'))
    assert (epoch, it) == (0, 2)


def test_stage3_mse_train_step(synth_root, tmp_path):
    from c2matching_tpu.data import create_dataset, DataLoader
    from c2matching_tpu.models import create_model

    opt = _mini_opt(synth_root, str(tmp_path), 'RefRestorationModel')
    opt['network_g'] = dict_to_nd({'type': 'RestorationNet', 'ngf': 16,
                                   'n_blocks': 2, 'groups': 8})
    opt['network_map'] = dict_to_nd({
        'type': 'CorrespondenceGenerationArch', 'patch_size': 3,
        'stride': 1, 'vgg_layer_list': ['relu1_1', 'relu2_1', 'relu3_1'],
        'vgg_type': 'vgg19'})
    opt['network_extractor'] = dict_to_nd({'type': 'ContrasExtractorSep'})
    opt['train'].update({
        'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
        'net_g_pretrain_steps': 0, 'net_d_steps': 1,
        'net_d_init_steps': 0, 'beta_g': [0.9, 0.999],
        'lr_offset': 1e-4, 'lr_relu2_offset': 1e-5,
        'lr_relu3_offset': 1e-6, 'lr_g': 1e-4,
    })

    ds = create_dataset(opt['datasets']['train'])
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    model = create_model(opt)

    batch = next(iter(loader))
    model.feed_data(batch)
    model.optimize_parameters(1)
    assert np.isfinite(model.log_dict['l_g_pix'])
    out = np.asarray(model.output)
    assert out.shape == (2, 64, 64, 3)
    # exploding-offset telemetry (reference dcn_v2.py:247-250): the
    # learned-residual absmean is logged per scale; zero-init offset
    # convs -> exactly 0 at step 1 (the update happens after the fwd)
    for scale in ('small', 'medium', 'large'):
        assert float(model.log_dict[f'offset_absmean_{scale}']) == 0.0


def test_stage3_train_step_bf16_gather_tracks_f32(synth_root, tmp_path):
    """gather_dtype='bfloat16' on the generator (the measured train-speed
    win: 611 -> 547 ms/GAN-iter at batch 9/160px on a v5e) must keep the
    pretrain step finite and track the f32 step's pixel loss closely
    (the gathers round features at ~0.4% relative)."""
    from c2matching_tpu.data import create_dataset, DataLoader
    from c2matching_tpu.models import create_model

    losses = {}
    for tag, gather in (('f32', None), ('bf16', 'bfloat16')):
        opt = _mini_opt(synth_root, str(tmp_path) + tag,
                        'RefRestorationModel')
        net_g = {'type': 'RestorationNet', 'ngf': 16, 'n_blocks': 2,
                 'groups': 8}
        if gather:
            net_g['gather_dtype'] = gather
        opt['network_g'] = dict_to_nd(net_g)
        opt['network_map'] = dict_to_nd({
            'type': 'CorrespondenceGenerationArch', 'patch_size': 3,
            'stride': 1,
            'vgg_layer_list': ['relu1_1', 'relu2_1', 'relu3_1'],
            'vgg_type': 'vgg19'})
        opt['network_extractor'] = dict_to_nd(
            {'type': 'ContrasExtractorSep'})
        opt['train'].update({
            'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
            'net_g_pretrain_steps': 0, 'net_d_steps': 1,
            'net_d_init_steps': 0, 'beta_g': [0.9, 0.999],
            'lr_offset': 1e-4, 'lr_relu2_offset': 1e-5,
            'lr_relu3_offset': 1e-6, 'lr_g': 1e-4,
        })
        ds = create_dataset(opt['datasets']['train'])
        loader = DataLoader(ds, batch_size=2, shuffle=False)
        model = create_model(opt)
        model.feed_data(next(iter(loader)))
        model.optimize_parameters(1)
        losses[tag] = float(model.log_dict['l_g_pix'])
        assert np.isfinite(losses[tag])
    np.testing.assert_allclose(losses['bf16'], losses['f32'], rtol=0.02)


@pytest.mark.proof
def test_stage3_gan_fused_step_matches_unfused(synth_root, tmp_path):
    """The single fused GAN jit (match -> vjp'd G forward -> D update ->
    G update) must reproduce the round-1 unfused step sequence
    (_match/_forward/_d_step/_g_step) exactly at a fixed seed."""
    import jax
    import jax.numpy as jnp
    from c2matching_tpu.data import create_dataset, DataLoader
    from c2matching_tpu.models import create_model

    opt = _mini_opt(synth_root, str(tmp_path), 'RefRestorationModel')
    opt['network_g'] = dict_to_nd({'type': 'RestorationNet', 'ngf': 16,
                                   'n_blocks': 2, 'groups': 8})
    opt['network_d'] = dict_to_nd({'type': 'ImageDiscriminator',
                                   'in_nc': 3, 'ndf': 4})
    opt['network_map'] = dict_to_nd({
        'type': 'CorrespondenceGenerationArch', 'patch_size': 3,
        'stride': 1, 'vgg_layer_list': ['relu1_1', 'relu2_1', 'relu3_1'],
        'vgg_type': 'vgg19'})
    opt['network_extractor'] = dict_to_nd({'type': 'ContrasExtractorSep'})
    opt['train'].update({
        'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
        'gan_type': 'wgan', 'gan_weight': 1e-2,
        'grad_penalty_weight': 10.0, 'lr_d': 1e-4,
        'net_g_pretrain_steps': 0, 'net_d_steps': 1,
        'net_d_init_steps': 0, 'lr_g': 1e-4,
    })

    ds = create_dataset(opt['datasets']['train'])
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    model = create_model(opt)
    model.feed_data(next(iter(loader)))

    def cp(t):
        return jax.tree.map(jnp.array, t)

    g0 = cp(model.vars_g['params'])
    og0 = cp(model.opt_state_g)
    d0 = cp(model.vars_d)
    od0 = cp(model.opt_state_d)
    rng = jax.random.PRNGKey(42)

    # --- unfused round-1 sequence
    pre, rf = model._match(model.vars_extractor, model.vars_map,
                           model.batch['img_in_up'],
                           model.batch['img_ref'])
    out, _ = model._forward(g0, model.batch['img_in_lq'], pre, rf)
    d1, od1, d_logs = model._d_step(cp(d0), cp(od0),
                                    model.batch['img_in'], out, rng)
    # _g_step also returns d_vars with the G-pass BN stat update (the
    # reference's fake_g_pred = net_d(output) runs in train mode)
    g1, og1, out1, g_logs, d1 = model._g_step(cp(g0), cp(og0), model.batch,
                                              pre, rf, d1,
                                              model.vars_perceptual)

    # --- fused
    g2, og2, d2, od2, out2, logs2 = model._gan_step(
        cp(g0), cp(og0), cp(d0), cp(od0), model.vars_extractor,
        model.vars_map, model.batch, model.vars_perceptual, rng,
        do_g=True)

    for name, a, b in (('g_params', g1, g2), ('d_vars', d1, d2),
                       ('opt_g', og1, og2), ('opt_d', od1, od2)):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=name)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)
    for k in ('l_g_pix', 'l_g_gan'):
        np.testing.assert_allclose(float(g_logs[k]), float(logs2[k]),
                                   rtol=1e-4)
    for k in ('l_d_real', 'l_d_fake', 'l_grad_penalty'):
        np.testing.assert_allclose(float(d_logs[k]), float(logs2[k]),
                                   rtol=1e-4)

    # the remat_policy override ('none' / 'dots') changes only what the
    # backward recomputes, never the math
    for policy in ('none', 'dots'):
        model.opt['train']['remat_policy'] = policy
        step_p = model._build_gan_step()
        g3, og3, d3, od3, out3, logs3 = step_p(
            cp(g0), cp(og0), cp(d0), cp(od0), model.vars_extractor,
            model.vars_map, model.batch, model.vars_perceptual, rng,
            do_g=True)
        for la, lb in zip(jax.tree.leaves(g2), jax.tree.leaves(g3)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f'remat={policy}')


def dict_to_nd(d):
    from c2matching_tpu.utils import dict_to_nonedict
    return dict_to_nonedict(d)


def test_orbax_async_checkpoint_roundtrip(tmp_path):
    """Opt-in orbax backend (path.checkpoint_backend: orbax): async
    network save -> directory checkpoints + latest alias; load_network
    restores the exact tree."""
    import jax
    from c2matching_tpu.models.base_model import BaseModel

    m = BaseModel.__new__(BaseModel)
    m.rank = 0
    m.opt = dict_to_nd({'path': {'models': str(tmp_path),
                                 'training_state': str(tmp_path),
                                 'checkpoint_backend': 'orbax'}})
    variables = {'params': {
        'w': np.arange(6, dtype=np.float32).reshape(2, 3),
        'nested': {'b': np.full((4,), 2.5, np.float32)},
    }}
    m.save_network(variables, 'net_g', 7)
    m.finalize_checkpoints()
    assert (tmp_path / 'net_g_7.orbax').is_dir()
    assert (tmp_path / 'net_g_latest.orbax').is_dir()

    for name in ('net_g_7.orbax', 'net_g_latest.orbax'):
        loaded = m.load_network(str(tmp_path / name), 'g')
        for a, b in zip(jax.tree.leaves(variables),
                        jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overwrite on a later save (force=True path) keeps latest fresh
    variables2 = jax.tree.map(lambda x: x + 1, variables)
    m.save_network(variables2, 'net_g', 9)
    m.finalize_checkpoints()
    latest = m.load_network(str(tmp_path / 'net_g_latest.orbax'), 'g')
    np.testing.assert_array_equal(
        np.asarray(latest['params']['w']),
        np.asarray(variables2['params']['w']))


def test_spectral_norm_d_state_threads_through_train_steps(synth_root,
                                                           tmp_path):
    """A spectral-norm discriminator's power iteration must RUN and
    PERSIST during training: every train-mode D apply passes all
    non-param collections as mutable (torch's spectral_norm updates u
    on each train-mode forward). Regression test for spectral_stats
    being silently frozen by mutable=['batch_stats']-only applies."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from c2matching_tpu.models import create_model
    from c2matching_tpu.models.archs.arch_util import SpectralNormConv

    class SNDisc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = SpectralNormConv(features=4)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9)(x)
            return jnp.mean(nn.relu(x), axis=(1, 2, 3))

    opt = _mini_opt(synth_root, str(tmp_path), 'RefRestorationModel')
    opt['network_g'] = dict_to_nd({'type': 'RestorationNet', 'ngf': 16,
                                   'n_blocks': 1, 'groups': 8})
    opt['network_d'] = dict_to_nd({'type': 'ImageDiscriminator',
                                   'in_nc': 3, 'ndf': 4})
    opt['network_map'] = dict_to_nd({
        'type': 'CorrespondenceGenerationArch', 'patch_size': 3,
        'stride': 1, 'vgg_layer_list': ['relu1_1', 'relu2_1', 'relu3_1'],
        'vgg_type': 'vgg19'})
    opt['network_extractor'] = dict_to_nd({'type': 'ContrasExtractorSep'})
    opt['train'].update({
        'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
        'gan_type': 'wgan', 'gan_weight': 1e-2,
        'grad_penalty_weight': 10.0, 'lr_d': 1e-4,
        'net_g_pretrain_steps': 0, 'net_d_steps': 1,
        'net_d_init_steps': 0, 'lr_g': 1e-4,
    })
    model = create_model(opt)

    # swap in the SN discriminator
    rng = jax.random.PRNGKey(0)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    fake = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    model.net_d = SNDisc()
    d_vars = dict(model.net_d.init(rng, gt, train=True))
    opt_d = model.tx_d.init(d_vars['params'])
    assert 'spectral_stats' in d_vars

    u0 = np.asarray(
        d_vars['spectral_stats']['SpectralNormConv_0']['u'])
    bn0 = np.asarray(d_vars['batch_stats']['BatchNorm_0']['mean'])

    new_vars, _, logs = model._d_update(d_vars, opt_d, gt, fake,
                                        jax.random.PRNGKey(3))
    u1 = np.asarray(
        new_vars['spectral_stats']['SpectralNormConv_0']['u'])
    bn1 = np.asarray(new_vars['batch_stats']['BatchNorm_0']['mean'])
    assert not np.allclose(u0, u1), 'power iteration did not persist'
    assert not np.allclose(bn0, bn1), 'BN running stats did not persist'
    assert np.isfinite(float(logs['l_d_real']))

    # the G-side D pass must thread the same collections
    total, g_logs, dstate = model._out_losses(
        fake, gt, new_vars, model.vars_perceptual, with_gan=True)
    assert set(dstate) >= {'spectral_stats', 'batch_stats'}
    u2 = np.asarray(
        dstate['spectral_stats']['SpectralNormConv_0']['u'])
    assert not np.allclose(u1, u2), 'G-side power iteration frozen'
