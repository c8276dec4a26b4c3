"""The serving YAML (bf16 gather + match knobs) must flow through
options.parse -> network factories -> a real eval forward, and stay
close to the f32 smoke config's output with identical (seeded) weights."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_serving')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '1', '--size', '64'],
        check=True)
    return str(root)


def test_serving_yaml_matches_f32_config(synth_root, tmp_path):
    from c2matching_tpu.data import DataLoader, create_dataset
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils.options import parse

    outs = {}
    for cfg in ('test_synth_smoke.yml', 'test_synth_smoke_serving.yml'):
        opt = parse(os.path.join(REPO, 'options', 'test', cfg),
                    is_train=False)
        # shrink for CPU: the knobs under test are dtype plumbing, not
        # capacity
        opt['network_g'].update({'ngf': 8, 'n_blocks': 1})
        ds_opt = opt['datasets']['test_1']
        ds_opt['dataroot_in'] = os.path.join(synth_root, 'input')
        ds_opt['dataroot_ref'] = os.path.join(synth_root, 'ref')
        ds_opt['ann_file'] = os.path.join(synth_root, 'pairs.txt')
        for k in ('models', 'training_state', 'visualization'):
            opt['path'][k] = str(tmp_path)
        opt['manual_seed'] = 0

        model = create_model(opt)
        ds = create_dataset(ds_opt)
        model.feed_data(next(iter(DataLoader(ds, batch_size=1))))
        model.test()
        outs[cfg] = np.asarray(model.output)

    base = outs['test_synth_smoke.yml']
    serving = outs['test_synth_smoke_serving.yml']
    assert np.all(np.isfinite(serving))
    # identical seeds -> identical params; only the bf16 gather/match
    # compute differs (~0.4% relative)
    err = (np.abs(serving - base).max()
           / max(np.abs(base).max(), 1e-6))
    assert err < 0.05, err
