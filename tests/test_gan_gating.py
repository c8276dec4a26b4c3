"""Stage-3 GAN phase gating parity (ref_restoration_model.py:199-242):
which of {pretrain-G, D, G} runs at each global step."""
import numpy as np
import pytest


def simulate(step, net_g_pretrain_steps, net_d_steps, net_d_init_steps,
             has_d=True):
    """Mirror of RefRestorationModel.optimize_parameters control flow."""
    ran = []
    if step <= net_g_pretrain_steps:
        return ['g_pretrain']
    if has_d:
        ran.append('d')
    do_g = ((step - net_g_pretrain_steps) % net_d_steps == 0
            and (step - net_g_pretrain_steps) > net_d_init_steps)
    if do_g:
        ran.append('g')
    return ran


def torch_reference(step, pretrain, d_steps, d_init, has_d=True):
    """Literal transcription of the reference's branches."""
    if step <= pretrain:
        return ['g_pretrain']
    ran = []
    if has_d:
        ran.append('d')
    if (step - pretrain) % d_steps == 0 and (step - pretrain) > d_init:
        ran.append('g')
    return ran


@pytest.mark.parametrize('pretrain,d_steps,d_init', [
    (10000, 1, 0),   # shipped stage3 GAN config
    (0, 1, 0),       # shipped stage3 MSE config (no D in practice)
    (5, 3, 2),       # exotic gating
    (0, 2, 1),
])
def test_gating_matches_reference(pretrain, d_steps, d_init):
    for step in range(1, 40):
        assert simulate(step, pretrain, d_steps, d_init) == \
            torch_reference(step, pretrain, d_steps, d_init), step


def test_model_control_flow_follows_gating(monkeypatch, tmp_path):
    """Drive RefRestorationModel.optimize_parameters with stubbed step
    functions and check which steps fire per iteration."""
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.models import create_model

    opt = dict_to_nonedict({
        'name': 'gate', 'is_train': True,
        'model_type': 'RefRestorationModel', 'scale': 4, 'crop_border': 4,
        'manual_seed': 0,
        'network_g': {'type': 'RestorationNet', 'ngf': 8, 'n_blocks': 1,
                      'groups': 8},
        'network_d': {'type': 'ImageDiscriminator', 'in_nc': 3, 'ndf': 2},
        'network_map': {'type': 'CorrespondenceGenerationArch'},
        'network_extractor': {'type': 'ContrasExtractorSep'},
        'path': {'models': str(tmp_path), 'training_state': str(tmp_path)},
        'train': {'lr_g': 1e-4, 'lr_d': 1e-4, 'lr_scheme': 'MultiStepLR',
                  'niter': 10, 'lr_steps': [], 'lr_gamma': 0.1,
                  'pixel_criterion': 'L1Loss', 'pixel_weight': 1.0,
                  'gan_type': 'wgan', 'gan_weight': 1e-6,
                  'grad_penalty_weight': 10.0,
                  'net_g_pretrain_steps': 2, 'net_d_steps': 2,
                  'net_d_init_steps': 1},
    })
    model = create_model(opt)

    calls = []
    model._g_pretrain_step = lambda *a: (
        calls.append('g_pretrain') or
        (model.vars_g['params'], model.opt_state_g, 'out', {}))

    def fused_stub(*a, do_g):
        # the fused step always runs D (net_d is configured) and runs G
        # iff do_g — record what the jitted graph would execute
        calls.append('d')
        if do_g:
            calls.append('g')
        return (model.vars_g['params'], model.opt_state_g, model.vars_d,
                model.opt_state_d, 'out', {})

    model._gan_step = fused_stub
    model.shard_batch = lambda b: b

    expected = []
    for step in range(1, 9):
        model.batch = {'img_in_lq': 0, 'img_ref': 0, 'img_in': 0,
                       'img_in_up': 0}
        model.optimize_parameters(step)
        expected.extend(simulate(step, 2, 2, 1))
    assert calls == expected
