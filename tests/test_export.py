"""StableHLO serving export (scripts/export_serving.py): serialize ->
deserialize -> call must reproduce the in-process fused serving forward.

This is the deployment artifact path the torch reference cannot offer
(its inference is Python-in-process only, mmsr/test.py): the exported
module carries the full pipeline + weights and runs without model code.
"""
import os
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast

REPO = osp.abspath(osp.join(osp.dirname(__file__), osp.pardir))
sys.path.insert(0, osp.join(REPO, 'scripts'))

from export_serving import build_serving_fn, export_serving  # noqa: E402


@pytest.fixture(scope='module')
def model():
    from c2matching_tpu.models import create_model
    from c2matching_tpu.utils import dict_to_nonedict
    from c2matching_tpu.utils.options import parse
    opt = dict_to_nonedict(
        parse(osp.join(REPO, 'options', 'test', 'test_synth_smoke.yml'),
              is_train=False))
    return create_model(opt)


def test_export_roundtrip_matches_direct(model):
    from jax import export as jexport
    exp = export_serving(model, batch=1, hr_h=64, hr_w=64,
                         platforms=['cpu'])
    data = exp.serialize()
    assert len(data) > 1_000_000  # weights are baked in as constants
    exp2 = jexport.deserialize(data)

    k = jax.random.PRNGKey(3)
    up = jax.random.uniform(k, (1, 64, 64, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    lr = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3))

    direct = np.asarray(jax.jit(build_serving_fn(model))(up, ref, lr))
    served = np.asarray(exp2.call(up, ref, lr))
    assert served.shape == (1, 64, 64, 3)
    assert np.isfinite(served).all()
    # same program, same platform: agreement to f32 roundoff
    assert np.max(np.abs(served - direct)) < 1e-5


def test_export_rejects_non_multiple_of_scale(model):
    with pytest.raises(ValueError):
        export_serving(model, batch=1, hr_h=62, hr_w=64)


def test_export_serves_without_model_code(model, tmp_path):
    """The artifact's core claim: a fresh process that never imports
    c2matching_tpu (only jax) can deserialize and run the pipeline."""
    import subprocess
    path = tmp_path / 'model.jaxexp'
    exp = export_serving(model, batch=1, hr_h=64, hr_w=64,
                         platforms=['cpu'])
    path.write_bytes(exp.serialize())

    runner = tmp_path / 'runner.py'
    runner.write_text(
        "import sys\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert not any(m.startswith('c2matching_tpu')"
        " for m in sys.modules), 'model code leaked into the server'\n"
        "from jax import export\n"
        f"exp = export.deserialize(open({str(path)!r}, 'rb').read())\n"
        "k = jax.random.PRNGKey(0)\n"
        "up = jax.random.uniform(k, (1, 64, 64, 3))\n"
        "ref = jax.random.uniform(k, (1, 64, 64, 3))\n"
        "lr = jax.random.uniform(k, (1, 16, 16, 3))\n"
        "out = exp.call(up, ref, lr)\n"
        "assert out.shape == (1, 64, 64, 3), out.shape\n"
        "assert bool(jnp.isfinite(out).all())\n"
        "print('served ok')\n")
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run([sys.executable, str(runner)], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'served ok' in res.stdout
