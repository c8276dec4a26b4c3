"""Batch serving CLI (scripts/serve.py): the framework's deployment
entry beyond the reference's batch-1 eval protocol (mmsr/test.py:13-66).

Asserts the batched path is faithful: serving the synth set at batch 2
(exercising both a full bucket flush and a padded partial flush) writes
the same images, to within one uint8 quantization step, as serving at
batch 1 — i.e. batching/padding is a pure throughput transform with no
numeric effect on outputs.
"""
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_serve')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '3', '--size', '160'],
        check=True)
    return str(root)


def run_serve(synth_root, out_dir, batch, tmp_path):
    src = open(osp.join(REPO, 'options', 'test',
                        'test_synth_smoke.yml')).read()
    cfg = (src
           .replace('./datasets/synth/input',
                    osp.join(synth_root, 'input'))
           .replace('./datasets/synth/ref', osp.join(synth_root, 'ref'))
           .replace('./datasets/synth/pairs.txt',
                    osp.join(synth_root, 'pairs.txt')))
    cfg_path = str(tmp_path / f'serve_b{batch}.yml')
    with open(cfg_path, 'w') as f:
        f.write(cfg)
    env = dict(os.environ,
               C2MATCHING_PLATFORM='cpu',
               PYTHONPATH=REPO,
               JAX_COMPILATION_CACHE_DIR=osp.join(REPO, '.xla_cache'),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS='10')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'serve.py'),
         '-opt', cfg_path, '--batch', str(batch), '--out', out_dir],
        check=True, env=env, timeout=900, cwd=REPO)
    return sorted(os.listdir(out_dir))


@pytest.mark.proof
def test_serve_batched_matches_batch1(synth_root, tmp_path):
    # batch 2 over 3 images: one full bucket flush + one padded partial
    out2 = str(tmp_path / 'b2')
    out1 = str(tmp_path / 'b1')
    names2 = run_serve(synth_root, out2, 2, tmp_path)
    names1 = run_serve(synth_root, out1, 1, tmp_path)
    pngs2 = [n for n in names2 if n.endswith('.png')]
    pngs1 = [n for n in names1 if n.endswith('.png')]
    assert pngs2 == pngs1 and len(pngs2) == 3
    for name in pngs2:
        a = np.asarray(Image.open(osp.join(out2, name)), dtype=np.int16)
        b = np.asarray(Image.open(osp.join(out1, name)), dtype=np.int16)
        assert a.shape == b.shape == (160, 160, 3)  # --size 160 HR pairs
        # batch-3 vs batch-1 executables may differ in reduction order;
        # anything beyond one quantization step is a real batching bug
        assert np.abs(a - b).max() <= 1, name


@pytest.mark.fast
def test_bucket_batches_separates_mixed_gt_sizes():
    """CUFED5-like case: pairs share a padded LR shape but differ in
    original GT size (input padded up to its larger ref). They must not
    share a batch, or collate on 'img_in' would fail; partial buckets
    all flush at the end."""
    sys.path.insert(0, osp.join(REPO, 'scripts'))
    from serve import bucket_batches

    def item(lq_hw, gt_hw, name):
        return {'img_in_lq': np.zeros(lq_hw + (3,), np.float32),
                'img_in': np.zeros(gt_hw + (3,), np.float32),
                'lq_path': f'{name}.png'}

    items = [item((125, 83), (500, 332), 'a'),   # padded to ref size
             item((125, 83), (400, 300), 'b'),   # same LR, smaller GT
             item((125, 83), (500, 332), 'c'),
             item((125, 83), (500, 332), 'd'),
             item((100, 83), (400, 332), 'e')]   # different LR bucket
    flushes = list(bucket_batches(iter(items), batch_size=2))

    # full flush: a+c (same LR and GT); partials: d, b, e
    sizes = sorted((len(f[0]) for f in flushes), reverse=True)
    assert sizes == [2, 1, 1, 1]
    assert sum(len(f[0]) for f in flushes) == len(items)
    for batch_items, names in flushes:
        gt_shapes = {it['img_in'].shape for it in batch_items}
        lq_shapes = {it['img_in_lq'].shape for it in batch_items}
        assert len(gt_shapes) == 1 and len(lq_shapes) == 1
    full = next(f for f in flushes if len(f[0]) == 2)
    assert [n.split('_')[0] for n in full[1]] == ['a', 'c']
