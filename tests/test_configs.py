"""Every shipped YAML parses and resolves to registered components.

The reference ships configs that silently rot (its own
transfer_params_MSRResNet references a nonexistent arch); here a schema
regression in ANY shipped option file fails fast: parse -> NoneDict ->
model/network/dataset types must exist in the registries.
"""
import glob
import os.path as osp

import pytest

pytestmark = pytest.mark.fast

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))

TRAIN = sorted(glob.glob(osp.join(REPO, 'options', 'train', '*.yml')))
TEST = sorted(glob.glob(osp.join(REPO, 'options', 'test', '*.yml')))


def _check_registries(opt, is_train):
    import c2matching_tpu.models.archs  # noqa: F401 - populates registry
    from c2matching_tpu.data import DATASET_REGISTRY
    from c2matching_tpu.models import MODEL_REGISTRY
    from c2matching_tpu.models.networks import ARCH_REGISTRY

    assert opt['model_type'] in MODEL_REGISTRY, opt['model_type']
    for phase, ds in (opt.get('datasets') or {}).items():
        assert ds['type'] in DATASET_REGISTRY, (phase, ds['type'])
    # every network_* block's arch must exist in the registry
    for key, block in opt.items():
        if key.startswith('network_') and isinstance(block, dict) \
                and block.get('type'):
            assert block['type'] in ARCH_REGISTRY, (key, block['type'])


@pytest.mark.parametrize('path', TRAIN, ids=[osp.basename(p) for p in TRAIN])
def test_train_config_parses(path, monkeypatch, tmp_path):
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = dict_to_nonedict(parse(path, is_train=True))
    assert opt['is_train']
    assert opt['train'].get('lr_g') is not None
    assert opt['train'].get('niter')
    _check_registries(opt, is_train=True)


@pytest.mark.parametrize('path', TEST, ids=[osp.basename(p) for p in TEST])
def test_test_config_parses(path, monkeypatch, tmp_path):
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    opt = dict_to_nonedict(parse(path, is_train=False))
    assert not opt['is_train']
    assert opt['scale'] == 4
    _check_registries(opt, is_train=False)
