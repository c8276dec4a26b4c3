"""x8 self-ensemble (SRModel.test_x8) vs a manual 8-transform oracle.

Reference: mmsr/models/sr_model.py:123-158 defines test_x8 (rot90 k=0..3
x optional horizontal flip, inverse-transform the outputs, average) but
never calls it from any config — dead code upstream. Here it is shipped
API surface AND reachable via `val: use_x8: true`, so it gets an oracle:
a NON-SQUARE input (catches rot90 shape/axis bugs) through a conv net
whose random kernels have no dihedral symmetry (so each transform's
output genuinely differs before inverse-mapping)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from c2matching_tpu.models.sr_model import SRModel

pytestmark = pytest.mark.fast


class _TinySR(nn.Module):
    """2x nearest upsample + conv: asymmetric random kernel, cheap."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        up = jnp.broadcast_to(x[:, :, None, :, None, :],
                              (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        return nn.Conv(3, (3, 3))(up)


def _mk_model():
    model = SRModel.__new__(SRModel)
    model.opt = {'is_train': False, 'val': {'use_x8': True}}
    model.is_train = False
    model.net_g = _TinySR()
    lq = jnp.zeros((1, 6, 10, 3))  # non-square
    model.vars_g = jax.jit(model.net_g.init)(jax.random.PRNGKey(7), lq)
    return model


def test_x8_matches_manual_ensemble():
    model = _mk_model()
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 6, 10, 3))

    model.batch = {'img_in_lq': lq}
    model.test_x8()
    got = np.asarray(model.output)
    assert got.shape == (2, 12, 20, 3)

    # manual oracle: forward each dihedral transform, inverse-map, average
    def fwd(x):
        return model.net_g.apply({'params': model.vars_g['params']}, x)

    outs = []
    for rot in range(4):
        xr = jnp.rot90(lq, k=rot, axes=(1, 2))
        for flip in (False, True):
            xf = jnp.flip(xr, axis=2) if flip else xr
            y = fwd(xf)
            if flip:
                y = jnp.flip(y, axis=2)
            outs.append(jnp.rot90(y, k=-rot, axes=(1, 2)))
    want = np.asarray(sum(outs) / 8)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # the ensemble must actually average DIFFERENT outputs (the kernels
    # have no dihedral symmetry), or the test proves nothing
    singles = np.stack([np.asarray(o) for o in outs])
    assert np.ptp(singles, axis=0).max() > 1e-3

    # self-consistency: ensembling an x-flipped input gives the
    # x-flipped ensemble (the x8 group average is equivariant)
    model.batch = {'img_in_lq': jnp.flip(lq, axis=2)}
    model.test_x8()
    np.testing.assert_allclose(np.asarray(jnp.flip(model.output, axis=2)),
                               got, atol=1e-5)


def test_use_x8_val_hook_switches_path():
    """`val: use_x8: true` routes _validation_images through test_x8."""
    model = _mk_model()
    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 6, 10, 3))
    val_data = {'img_in_lq': np.asarray(lq),
                'img_in': np.zeros((1, 12, 20, 3), np.float32)}

    model.feed_data = lambda vd: setattr(model, 'batch',
                                         {'img_in_lq': lq})
    sr_img, _ = model._validation_images(val_data)

    model.batch = {'img_in_lq': lq}
    model.test_x8()
    want_x8 = np.asarray(model.output)
    model.test()
    want_plain = np.asarray(model.output)

    from c2matching_tpu.utils import tensor2img
    np.testing.assert_array_equal(sr_img, tensor2img(want_x8))
    assert np.any(tensor2img(want_x8) != tensor2img(want_plain))

    # and with the flag off, the plain path
    model.opt['val']['use_x8'] = False
    sr_img2, _ = model._validation_images(val_data)
    np.testing.assert_array_equal(sr_img2, tensor2img(want_plain))
