"""End-to-end three-stage pipeline integration (CPU, tiny shapes):
stage-1 teacher -> stage-2 student (loads stage-1 ckpt) -> stage-3
restoration (loads stage-2 extractor ckpt) -> validation. Mirrors the
reference's cross-stage YAML handoff (stage2...yml:51,
stage3_restoration_gan.yml:66)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth3stage')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '4', '--size', '64'],
        check=True)
    return str(root)


def _contras_opt(root, tmp, model_type, stage_dir, extra_path=None):
    from c2matching_tpu.utils import dict_to_nonedict
    opt = {
        'name': f'it_{stage_dir}', 'is_train': True,
        'model_type': model_type, 'scale': 4, 'crop_border': 4,
        'manual_seed': 0,
        'datasets': {'train': {
            'name': 'synth', 'phase': 'train', 'scale': 4,
            'type': 'ContrasDataset', 'gt_size': 64,
            'use_flip': False, 'use_rot': False,
            'dataroot_in': os.path.join(root, 'input'),
            'dataroot_ref': os.path.join(root, 'ref'),
            'io_backend': {'type': 'disk'},
            'ann_file': os.path.join(root, 'pairs.txt'),
            'batch_size': 2,
        }},
        'path': dict({'models': os.path.join(tmp, stage_dir, 'models'),
                      'training_state': os.path.join(tmp, stage_dir,
                                                     'state')},
                     **(extra_path or {})),
        'train': {'lr_g': 1e-3, 'lr_scheme': 'MultiStepLR', 'niter': 4,
                  'warmup_iter': -1, 'lr_steps': [], 'lr_gamma': 0.1,
                  'margin': 1.0, 'safe_radius': 4, 'scaling_steps': 2,
                  'distill_weight': 15.0, 'temperature': 0.15},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 1000},
    }
    if model_type == 'TeacherContrasModel':
        opt['network_g'] = {'type': 'ContrasExtractorSep'}
    else:
        opt['network_student'] = {'type': 'ContrasExtractorSep'}
        opt['network_teacher'] = {'type': 'ContrasExtractorSep'}
    return dict_to_nonedict(opt)


def test_three_stage_pipeline(synth_root, tmp_path, monkeypatch):
    # 64px images have < 128 valid correspondences; relax the skip rule
    # for this tiny integration run
    import c2matching_tpu.models.contras_losses as cl
    monkeypatch.setattr(cl, 'MIN_VALID_CORRS', 8)

    from c2matching_tpu.data import DataLoader, create_dataset
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    tmp = str(tmp_path)

    # ---- stage 1: teacher
    opt1 = _contras_opt(synth_root, tmp, 'TeacherContrasModel', 's1')
    ds = create_dataset(opt1['datasets']['train'])
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    teacher = create_model(opt1)
    batch = next(iter(loader))
    teacher.feed_data(batch)
    teacher.optimize_parameters(1)
    assert np.isfinite(float(teacher.log_dict['loss']))
    teacher.save(0, 4)
    t_ckpt = os.path.join(tmp, 's1', 'models', 'net_g_latest.ckpt')
    assert os.path.exists(t_ckpt)

    # ---- stage 2: student loads the stage-1 teacher
    opt2 = _contras_opt(synth_root, tmp, 'StudentContrasDistillationModel',
                        's2', {'pretrain_model_teacher': t_ckpt})
    student = create_model(opt2)
    # teacher weights must equal the stage-1 checkpointed weights
    import jax
    t_leaf = jax.tree.leaves(teacher.vars_g)[0]
    s_leaf = jax.tree.leaves(student.vars_teacher)[0]
    np.testing.assert_array_equal(np.asarray(t_leaf), np.asarray(s_leaf))
    student.feed_data(batch)
    student.optimize_parameters(1)
    assert np.isfinite(float(student.log_dict['distill_loss']))
    student.save(0, 4)
    s_ckpt = os.path.join(tmp, 's2', 'models', 'net_student_latest.ckpt')

    # ---- stage 3: restoration loads the stage-2 extractor
    opt3 = dict_to_nonedict({
        'name': 'it_s3', 'is_train': True,
        'model_type': 'RefRestorationModel', 'scale': 4, 'crop_border': 4,
        'manual_seed': 0,
        'datasets': {'train': {
            'name': 'synth', 'phase': 'train', 'scale': 4,
            'type': 'RefCUFEDDataset', 'gt_size': 64,
            'use_flip': False, 'use_rot': False,
            'dataroot_in': os.path.join(synth_root, 'input'),
            'dataroot_ref': os.path.join(synth_root, 'ref'),
            'io_backend': {'type': 'disk'},
            'ann_file': os.path.join(synth_root, 'pairs.txt'),
            'batch_size': 2,
        }},
        'network_g': {'type': 'RestorationNet', 'ngf': 16, 'n_blocks': 2,
                      'groups': 8},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'models': os.path.join(tmp, 's3', 'models'),
                 'training_state': os.path.join(tmp, 's3', 'state'),
                 'pretrain_model_feature_extractor': s_ckpt},
        'train': {'lr_g': 1e-4, 'lr_offset': 1e-4,
                  'lr_relu2_offset': 1e-5, 'lr_relu3_offset': 1e-6,
                  'beta_g': [0.9, 0.999], 'lr_scheme': 'MultiStepLR',
                  'niter': 4, 'warmup_iter': -1, 'lr_steps': [],
                  'lr_gamma': 0.1, 'pixel_criterion': 'L1Loss',
                  'pixel_weight': 1.0, 'net_g_pretrain_steps': 0,
                  'net_d_steps': 1, 'net_d_init_steps': 0,
                  'manual_seed': 10},
        'logger': {'print_freq': 1, 'save_checkpoint_freq': 1000},
    })
    ds3 = create_dataset(opt3['datasets']['train'])
    loader3 = DataLoader(ds3, batch_size=2, shuffle=False)
    model3 = create_model(opt3)
    # extractor weights came from the stage-2 student checkpoint
    s2_leaf = jax.tree.leaves(student.vars_student)[0]
    m3_leaf = jax.tree.leaves(model3.vars_extractor)[0]
    np.testing.assert_array_equal(np.asarray(s2_leaf), np.asarray(m3_leaf))

    batch3 = next(iter(loader3))
    model3.feed_data(batch3)
    model3.optimize_parameters(1)
    assert np.isfinite(float(model3.log_dict['l_g_pix']))
    out = np.asarray(model3.output)
    assert out.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(out))
