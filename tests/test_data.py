"""Data pipeline tests: synthetic dataset tree, RefCUFED semantics,
contras homography grids, sampler/loader behavior."""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synthdata')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '4', '--size', '160'],
        check=True)
    return str(root)


def _train_opt(root):
    return {
        'name': 'synth', 'type': 'RefCUFEDDataset', 'phase': 'train',
        'scale': 4, 'gt_size': 160, 'use_flip': True, 'use_rot': True,
        'dataroot_in': os.path.join(root, 'input'),
        'dataroot_ref': os.path.join(root, 'ref'),
        'io_backend': {'type': 'disk'},
        'ann_file': os.path.join(root, 'pairs.txt'),
    }


def test_ref_cufed_train_item(synth_root):
    from c2matching_tpu.data import create_dataset
    ds = create_dataset(_train_opt(synth_root))
    assert len(ds) == 4
    item = ds[0]
    assert item['img_in'].shape == (160, 160, 3)
    assert item['img_in_lq'].shape == (40, 40, 3)
    assert item['img_in_up'].shape == (160, 160, 3)
    assert item['img_ref'].shape == (160, 160, 3)
    for v in item.values():
        assert v.dtype == np.float32
        assert 0.0 <= v.min() and v.max() <= 1.0
    # lq-up chain must be a real degradation (not identity)
    assert np.abs(item['img_in_up'] - item['img_in']).mean() > 1e-3


def test_ref_cufed_test_item_padding(synth_root):
    from c2matching_tpu.data import create_dataset
    opt = _train_opt(synth_root)
    opt['phase'] = 'test'
    ds = create_dataset(opt)
    item = ds[0]
    assert item['padding'] in (False, True)
    assert item['original_size'] == (160, 160)
    assert 'lq_path' in item


def test_pil_bicubic_matches_reference_protocol(synth_root):
    """The lq must equal PIL's own .resize on the uint8 RGB image —
    this is the metric-critical degradation (ref_cufed_dataset.py:118-143).
    """
    import cv2
    from PIL import Image
    from c2matching_tpu.data.util import pil_chain_lq_up

    rng = np.random.RandomState(3)
    img_bgr = rng.rand(32, 32, 3).astype(np.float32)
    lq, up = pil_chain_lq_up(img_bgr, 4)

    u8 = (img_bgr * 255).astype(np.uint8)
    pil = Image.fromarray(cv2.cvtColor(u8, cv2.COLOR_BGR2RGB))
    ref_lq = pil.resize((8, 8), Image.BICUBIC)
    ref_up = ref_lq.resize((32, 32), Image.BICUBIC)
    np.testing.assert_array_equal(
        (lq * 255).round().astype(np.uint8),
        cv2.cvtColor(np.array(ref_lq), cv2.COLOR_RGB2BGR))
    np.testing.assert_array_equal(
        (up * 255).round().astype(np.uint8),
        cv2.cvtColor(np.array(ref_up), cv2.COLOR_RGB2BGR))


def test_contras_dataset(synth_root):
    from c2matching_tpu.data import create_dataset
    opt = _train_opt(synth_root)
    opt['type'] = 'ContrasDataset'
    ds = create_dataset(opt)
    item = ds[0]
    assert item['img_in'].shape == (160, 160, 3)
    assert item['img_ref'].shape == (160, 160, 3)
    assert item['transformed_coordinate'].shape == (160, 160, 3)
    # homogeneous coordinate is normalized to 1
    np.testing.assert_allclose(item['transformed_coordinate'][..., 2], 1.0,
                               atol=1e-5)


def test_contras_val_dataset_deterministic(synth_root):
    from c2matching_tpu.data import create_dataset
    opt = _train_opt(synth_root)
    opt['type'] = 'ContrasValDataset'
    opt['phase'] = 'val'
    ds1 = create_dataset(opt)
    ds2 = create_dataset(dict(opt))
    np.testing.assert_array_equal(ds1.transform_matrices[0],
                                  ds2.transform_matrices[0])


def test_sampler_process_partition():
    from c2matching_tpu.data import EnlargedIterSampler
    n, world = 10, 4
    samplers = [EnlargedIterSampler(n, world, r, ratio=2) for r in range(4)]
    all_indices = []
    for s in samplers:
        s.set_epoch(3)
        idx = list(s)
        assert len(idx) == len(s)
        all_indices.extend(idx)
    # all shards together cover the enlarged permutation exactly
    assert len(all_indices) == samplers[0].total_size
    assert set(all_indices) <= set(range(n))
    # epoch changes the permutation
    samplers[0].set_epoch(4)
    assert list(samplers[0]) != idx


def test_dataloader_batching(synth_root):
    from c2matching_tpu.data import DataLoader, create_dataset
    ds = create_dataset(_train_opt(synth_root))
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['img_in'].shape == (2, 160, 160, 3)
    assert batches[0]['img_in_lq'].shape == (2, 40, 40, 3)


def test_loader_propagates_worker_errors():
    """A raising __getitem__ must surface in the consumer (torch
    DataLoader re-raises worker errors) — not strand it on a queue
    forever with a dead producer thread."""
    from c2matching_tpu.data.loader import DataLoader

    class Flaky:
        def __len__(self):
            return 10

        def __getitem__(self, idx):
            if idx == 3:
                raise RuntimeError('corrupt sample')
            return {'x': np.zeros((2, 2), np.float32)}

    loader = DataLoader(Flaky(), batch_size=2, shuffle=False,
                        num_workers=2)
    with pytest.raises(RuntimeError, match='corrupt sample'):
        for _ in loader:
            pass
