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


def test_check_resume_points_at_matching_ckpts(tmp_path):
    """check_resume must redirect pretrain paths to the resume-iter
    checkpoints for BOTH backends: msgpack .ckpt files and opt-in orbax
    .orbax directories (reference semantics: utils/util.py check_resume
    overrides pretrain_model_* whenever resume_state is set)."""
    from c2matching_tpu.utils.util import check_resume

    models = tmp_path / 'models'
    models.mkdir()
    (models / 'net_g_7.ckpt').write_bytes(b'x')      # msgpack file
    (models / 'net_d_7.orbax').mkdir()               # orbax directory
    opt = {'path': {
        'resume_state': str(tmp_path / '7.state'),
        'models': str(models),
        'pretrain_model_g': '/stale/pretrained_g.pth',
        'pretrain_model_d': None,
        'pretrain_model_feature_extractor': '/stale/extractor.pth',
    }}
    check_resume(opt, 7)
    assert opt['path']['pretrain_model_g'] == str(models / 'net_g_7.ckpt')
    assert opt['path']['pretrain_model_d'] == str(models / 'net_d_7.orbax')
    # no checkpoint for the extractor at iter 7: the pretrain path must
    # survive untouched (frozen nets are loaded from pretrain on resume)
    assert (opt['path']['pretrain_model_feature_extractor']
            == '/stale/extractor.pth')


def test_compile_cache_scoped_by_host_isa(tmp_path):
    """The persistent cache dir must embed a host-ISA fingerprint:
    XLA:CPU AOT executables compiled on another machine's vector
    extensions load (with SIGILL-risk warnings) because XLA's own cache
    key omits host machine features — observed live after a container
    moved hosts. Same host => stable dir; different flags => new dir."""
    from c2matching_tpu.utils import compile_cache as cc

    fp = cc._host_fingerprint()
    assert len(fp) == 12 and int(fp, 16) >= 0
    assert fp == cc._host_fingerprint()

    import jax
    before = jax.config.jax_compilation_cache_dir
    try:
        cc.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir.endswith(fp)
    finally:
        jax.config.update('jax_compilation_cache_dir', before)
