"""The one-command CUFED5 quality-parity harness must be provably
runnable (VERDICT r3 item 4): real weights/data are unavailable in this
environment, so scripts/parity_cufed5.py --synthetic executes the ENTIRE
harness end to end — synthetic CUFED5-layout dataset generation, pair
zero-padding (ref larger than input), bucket-padded eval, the 3-metric
protocol and the JSON report — on random-init weights. The day the
released ``.pth`` weights and CUFED5 appear, the same command minus
--synthetic produces the 0.05 dB verdict (BASELINE.md)."""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))


def test_parity_cufed5_synthetic_dry_run(tmp_path):
    out = str(tmp_path / 'parity_out')
    # no cache env overrides: the script calls enable_persistent_cache
    # itself, which scopes the directory by host-ISA fingerprint (a raw
    # JAX_COMPILATION_CACHE_DIR pointing at the .xla_cache root would
    # bypass that scoping and resurrect the cross-host AOT hazard)
    env = dict(os.environ, C2MATCHING_PLATFORM='cpu', PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, osp.join(REPO, 'scripts', 'parity_cufed5.py'),
         '--synthetic', '--out', out],
        check=True, env=env, timeout=1800, cwd=REPO)

    with open(osp.join(out, 'parity.json')) as f:
        result = json.load(f)
    assert result['n_images'] == 2
    for k in ('psnr', 'psnr_y', 'ssim_y'):
        assert np.isfinite(result[k]), (k, result)
    # random weights: no baseline verdict is emitted in --synthetic mode
    assert 'verdict' not in result
