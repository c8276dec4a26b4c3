"""End-to-end golden metric: the full test-CLI pipeline (dataset ->
loader -> RefRestorationModel.validation) must reproduce pinned
PSNR/PSNR_Y/SSIM_Y values on the deterministic synth set.

This is the tripwire the reference's own QA is built on
(ref_restoration_model.py:337-352 computes exactly these metrics): any
silent numeric drift anywhere in the pipeline — data decode, bicubic
chain, matching, DCN, metrics — moves these numbers and fails here
(VERDICT r2 item 2). Weights are the seeded random init (manual_seed 0,
no pretrained weights exist in this environment); the values pin the
implementation, not paper quality.
"""
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))

# pinned on the 8-device virtual CPU mesh (XLA CPU f32); tolerance 1e-4
# relative is PSNR-grade — re-pin deliberately if a numeric change is
# intended, never to silence a drift.
#
# Re-pin history:
# - round 4, bucket-padding invariance (PARITY.md "Round 4" item 2):
#   eval at these shapes bucket-pads LR 40->48, and the pad bands used
#   to leak into convs/matcher/flow; the invariance protocol masks them
#   out, so padded eval now equals exact-shape eval and all three
#   metrics moved UP (psnr 30.7375 -> 30.8132). Captured via the
#   __main__ capture mode under the test's platform config.
GOLDEN = {
    'psnr': 30.813193655565332,
    'psnr_y': 34.41070486923178,
    'ssim_y': 0.9122629557683419,
}


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth_golden')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'make_synth_dataset.py'),
         str(root), '--n', '3', '--size', '160'],
        check=True)
    return str(root)


def run_validation(synth_root, out_root):
    from c2matching_tpu.data import create_dataloader, create_dataset
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse

    opt = parse(osp.join(REPO, 'options', 'test', 'test_synth_smoke.yml'),
                is_train=False)
    ds = opt['datasets']['test_1']
    ds['dataroot_in'] = osp.join(synth_root, 'input')
    ds['dataroot_ref'] = osp.join(synth_root, 'ref')
    ds['ann_file'] = osp.join(synth_root, 'pairs.txt')
    opt['save_img'] = False
    opt = dict_to_nonedict(opt)

    dataset = create_dataset(opt['datasets']['test_1'])
    loader = create_dataloader(dataset, opt['datasets']['test_1'])
    model = create_model(opt)
    return model.validation(loader, current_iter='golden', tb_logger=None,
                            save_img=False)


@pytest.mark.proof
def test_e2e_golden_metrics(synth_root, tmp_path, monkeypatch):
    monkeypatch.setenv('C2MATCHING_ROOT', str(tmp_path))
    avgs = run_validation(synth_root, str(tmp_path))
    for k, want in GOLDEN.items():
        got = float(avgs[k])
        assert got == pytest.approx(want, rel=1e-4), (
            f'{k}: got {got!r}, pinned {want!r} — end-to-end numeric '
            f'drift; find the cause before re-pinning')


if __name__ == '__main__':
    # capture mode: print the metric values to pin
    import tempfile
    sroot = tempfile.mkdtemp(prefix='synth_golden_')
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'make_synth_dataset.py'),
         sroot, '--n', '3', '--size', '160'], check=True)
    print(run_validation(sroot, sroot))
