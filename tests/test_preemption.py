"""Preemption-aware checkpointing (mmsr/train.py:125-171, beyond the
reference): SIGTERM mid-training must write a resumable state before
exit, and the state must actually resume."""
import os
import os.path as osp
import signal
import subprocess
import sys
import time

import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_preempt')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '4', '--size', '160'],
        check=True)
    return str(root)


def test_sigterm_saves_resumable_state(synth_root, tmp_path, monkeypatch):
    name = 'preempt_t'
    src = open(osp.join(REPO, 'options', 'train',
                        'debug_stage1_synth.yml')).read()
    cfg = (src
           .replace('name: debug_stage1_synth', f'name: {name}')
           .replace('niter: 8', 'niter: 5000')
           .replace('./datasets/synth/input',
                    osp.join(synth_root, 'input'))
           .replace('./datasets/synth/ref', osp.join(synth_root, 'ref'))
           .replace('./datasets/synth/pairs.txt',
                    osp.join(synth_root, 'pairs.txt'))
           .replace('save_checkpoint_freq: 8',
                    'save_checkpoint_freq: 100000'))
    cfg_path = str(tmp_path / 'preempt.yml')
    open(cfg_path, 'w').write(cfg)

    out_root = str(tmp_path / 'out_root')   # experiments tree -> tmp
    env = dict(os.environ)
    env['C2MATCHING_ROOT'] = out_root
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    env['JAX_PLATFORMS'] = 'cpu'
    env['C2MATCHING_PLATFORM'] = 'cpu'   # env var alone is too late here
    env['PYTHONPATH'] = os.pathsep.join(
        p for p in [REPO, env.get('PYTHONPATH', '')] if p)

    out_path = str(tmp_path / 'train.out')
    with open(out_path, 'w') as out:
        proc = subprocess.Popen(
            [sys.executable, osp.join(REPO, 'mmsr', 'train.py'),
             '-opt', cfg_path],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT)
    try:
        # wait until a few iterations have been logged (post-compile)
        deadline = time.time() + 330
        while time.time() < deadline:
            log = open(out_path).read()
            if 'iter:       3' in log:
                break
            assert proc.poll() is None, f'train.py died early:\n{log}'
            time.sleep(2)
        else:
            pytest.fail('training never reached iter 3:\n'
                        + open(out_path).read())

        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0, open(out_path).read()
    finally:
        if proc.poll() is None:
            proc.kill()

    log = open(out_path).read()
    assert 'checkpointing before exit' in log
    assert 'preemption' in log

    state_dir = osp.join(out_root, 'experiments', name, 'training_state')
    states = sorted(os.listdir(state_dir))
    assert states, 'no training state written on SIGTERM'

    # the state must resume: check_resume + resume_training path
    import numpy as np
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils.options import parse
    monkeypatch.setenv('C2MATCHING_ROOT', out_root)
    opt = parse(cfg_path, is_train=True)
    state_path = osp.join(state_dir, states[-1])
    opt['path']['resume_state'] = state_path
    from c2matching_tpu.utils.util import check_resume
    it = int(states[-1].split('.')[0])
    check_resume(opt, it)
    model = create_model(opt)
    epoch, resumed_iter = model.resume_training(state_path)
    assert resumed_iter == it
    assert np.isfinite(
        float(np.asarray(
            next(iter(__import__('jax').tree.leaves(model.vars_g))))
            .ravel()[0]))
