"""YAML option parsing with the reference's schema and semantics.

Parity target: mmsr/utils/options.py in the reference (parse :32-98,
dict_to_nonedict :129-146). Same YAML keys, same derived paths, same
NoneDict option-defaulting-by-omission behaviour, same debug-mode overrides.
TPU difference: ``gpu_ids`` / ``set_CUDA_VISIBLE_DEVICES`` are accepted but
only informational — device selection is JAX's job.
"""
import os
import os.path as osp

import yaml


def _repo_root():
    # <repo>/c2matching_tpu/utils/options.py -> <repo>
    return osp.abspath(osp.join(osp.dirname(__file__), osp.pardir, osp.pardir))


def parse(opt_path, is_train=True):
    """Parse an option YAML file into a plain dict (insertion-ordered).

    Injects ``is_train``, defaults ``crop_border`` to ``scale``, stamps each
    dataset block with ``phase``/``scale`` (phase = key prefix before '_', so
    ``test_1`` -> ``test``), expands '~' in paths, and derives the experiment
    / results output tree from the repo root and the experiment ``name``.
    """
    with open(opt_path, 'r') as f:
        opt = yaml.safe_load(f)

    opt['is_train'] = is_train
    scale = opt.get('scale', 4)
    if opt.get('crop_border', None) is None:
        opt['crop_border'] = scale

    for phase_key, dataset in (opt.get('datasets') or {}).items():
        phase = phase_key.split('_')[0]
        dataset['phase'] = phase
        dataset['scale'] = scale
        for root_key in ('dataroot_gt', 'dataroot_lq', 'dataroot_in',
                         'dataroot_ref'):
            if dataset.get(root_key, None) is not None:
                dataset[root_key] = osp.expanduser(dataset[root_key])

    opt.setdefault('path', {})
    for key, path in list(opt['path'].items()):
        if path and key != 'strict_load' and isinstance(path, str):
            opt['path'][key] = osp.expanduser(path)
    # C2MATCHING_ROOT redirects the experiments/results output tree
    # (tests point it at a tmp dir so runs don't pollute the checkout).
    opt['path']['root'] = os.environ.get('C2MATCHING_ROOT') or _repo_root()

    if is_train:
        experiments_root = osp.join(opt['path']['root'], 'experiments',
                                    opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_state'] = osp.join(experiments_root,
                                                 'training_state')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root,
                                                'visualization')
        if 'debug' in opt['name']:
            opt.setdefault('val', {})['val_freq'] = 8
            opt.setdefault('logger', {})['print_freq'] = 1
            opt['logger']['save_checkpoint_freq'] = 8
    else:
        results_root = osp.join(opt['path']['root'], 'results', opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root, 'visualization')

    return opt


def dict2str(opt, indent_level=1):
    """Pretty-print an option dict (reference log format)."""
    msg = ''
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':[\n'
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg


class NoneDict(dict):
    """dict returning None for missing keys (option default-by-omission)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert dicts to NoneDict (lists traversed too)."""
    if isinstance(opt, dict):
        return NoneDict(
            **{key: dict_to_nonedict(sub) for key, sub in opt.items()})
    elif isinstance(opt, list):
        return [dict_to_nonedict(sub) for sub in opt]
    return opt
