"""Data-parallel trust properties of the stage-1/2 (contras) train steps.

Completes the §2.8 DP-equivalence story: test_parallel_production.py
covers the stage-3 fused GAN step; here the TeacherContrasModel and
StudentContrasDistillationModel production steps must compute the same
update 8-way-sharded as on a single device (the reference trains all
three stages under the same DDP wrapper, base_model.py:70-75).
"""
import os.path as osp

import jax
import numpy as np
import pytest

# not 'fast': compiles four full contras models on the CPU mesh —
# sub-minute only with a warm .xla_cache, minutes cold
REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))

# GT must give >=128 correspondences inside the 10px-margin validity
# band at feature stride 4 (contras_losses.py:63-64): GT 96 -> 19x19
# interior cells = 361 candidates; GT 64 would cap at ~121 < 128 and
# close the gate.
GT, BATCH = 96, 8


def _make_opt(tmp_root, stage, monkeypatch):
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_root))
    opt = parse(osp.join(REPO, 'options', 'train',
                         f'debug_stage{stage}_synth.yml'), is_train=True)
    opt['name'] = f'dp_equiv_s{stage}'
    if stage == 2:
        opt['path']['pretrain_model_teacher'] = None  # random frozen teacher
    return dict_to_nonedict(opt)


def _make_batch(seed):
    from c2matching_tpu.data.contras_dataset import \
        transformed_coordinate_grid
    rng = np.random.RandomState(seed)
    batch = {
        'img_in': rng.rand(BATCH, GT, GT, 3).astype(np.float32),
        'img_in_up': rng.rand(BATCH, GT, GT, 3).astype(np.float32),
        'img_ref': rng.rand(BATCH, GT, GT, 3).astype(np.float32),
    }
    grids = []
    for _ in range(BATCH):
        h_inv = np.eye(3) + rng.uniform(-1e-3, 1e-3, (3, 3))
        h_inv[:2, 2] += rng.uniform(-4.0, 4.0, 2)
        grids.append(transformed_coordinate_grid(h_inv, GT, GT))
    batch['transformed_coordinate'] = np.stack(grids)
    return batch


def _tree_max_delta(a, b):
    a = jax.device_get(a)
    b = jax.device_get(b)
    deltas = jax.tree.map(
        lambda x, y: float(np.max(np.abs(
            np.asarray(x, np.float32) - np.asarray(y, np.float32))))
        if np.asarray(x).size else 0.0, a, b)
    return max(jax.tree.leaves(deltas) or [0.0])


def _params_of(model):
    return (model.vars_g['params'] if hasattr(model, 'vars_g')
            else model.vars_student['params'])


@pytest.mark.parametrize('stage', [1, 2])
def test_contras_step_dp_equivalence(stage, tmp_path, monkeypatch):
    """One production step, 8-way-sharded vs single-device: losses agree
    to f32 reduction noise; params within the O(lr) Adam sign-flip
    bound. Also asserts the >=128-correspondence gate is actually open
    (n_valid > 0), so the equivalence is not vacuous."""
    from c2matching_tpu.models import base_model as bm
    from c2matching_tpu.models import create_model
    from c2matching_tpu.parallel.mesh import get_mesh

    opt = _make_opt(tmp_path, stage, monkeypatch)
    batch = _make_batch(17)

    model_8 = create_model(opt)
    model_8.feed_data(batch)
    model_8.optimize_parameters(1)

    monkeypatch.setattr(bm, 'get_mesh',
                        lambda: get_mesh(jax.devices()[:1]))
    model_1 = create_model(opt)
    model_1.feed_data(batch)
    model_1.optimize_parameters(1)

    assert float(model_8.log_dict['n_valid']) == BATCH, (
        'correspondence gate closed — test inputs are not exercising '
        'the production loss path')
    for k, v8 in model_8.log_dict.items():
        v1 = float(model_1.log_dict[k])
        v8 = float(v8)
        assert np.isfinite(v8), (k, v8)
        assert abs(v8 - v1) <= 1e-4 * max(1.0, abs(v1)), (
            f'stage {stage} loss {k}: sharded {v8} vs single {v1}')
    lr = float(opt['train']['lr_g'])
    delta = _tree_max_delta(_params_of(model_8), _params_of(model_1))
    assert delta < 2 * lr, f'stage {stage} params diverged: {delta}'
