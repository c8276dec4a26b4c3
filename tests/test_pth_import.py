"""Parity tests: random-weight torch modules -> .pth -> flax import ->
identical forward outputs (CPU torch vs CPU jax)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _torch_vgg16_prefix():
    """torchvision-like VGG16 features up to conv3_1 inclusive
    (mirrors contras_extractor_arch.py:13-28 without torchvision)."""
    layers = [
        tnn.Conv2d(3, 64, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(64, 64, 3, 1, 1), tnn.ReLU(True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(64, 128, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(128, 128, 3, 1, 1), tnn.ReLU(True),
        tnn.MaxPool2d(2, 2),
        tnn.Conv2d(128, 256, 3, 1, 1),
    ]
    names = ['conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1',
             'conv2_1', 'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1']
    from collections import OrderedDict
    return tnn.Sequential(OrderedDict(zip(names, layers)))


class _TorchContrasLayer(tnn.Module):

    def __init__(self):
        super().__init__()
        self.model = _torch_vgg16_prefix()
        self.register_buffer(
            'mean', torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer(
            'std', torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(self, x):
        return self.model((x - self.mean) / self.std)


def test_contras_extractor_import_parity(tmp_path):
    from c2matching_tpu.models.archs import ContrasExtractorSep
    from c2matching_tpu.utils.pth_import import import_contras_extractor

    torch.manual_seed(0)
    tmod = tnn.Module()
    tmod.feature_extraction_image1 = _TorchContrasLayer()
    tmod.feature_extraction_image2 = _TorchContrasLayer()
    path = str(tmp_path / 'net_extractor.pth')
    torch.save(tmod.state_dict(), path)

    variables = import_contras_extractor(path)

    rng = np.random.RandomState(0)
    img1 = rng.rand(1, 32, 32, 3).astype(np.float32)
    img2 = rng.rand(1, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        t1 = tmod.feature_extraction_image1(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)))
        t2 = tmod.feature_extraction_image2(
            torch.from_numpy(img2.transpose(0, 3, 1, 2)))

    model = ContrasExtractorSep()
    out = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(img1),
        jnp.asarray(img2))

    np.testing.assert_allclose(
        np.asarray(out['dense_features1']),
        t1.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['dense_features2']),
        t2.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_vgg19_import_parity(tmp_path):
    """torchvision-format vgg19 .pth -> VGGFeatureExtractor: outputs match
    a torch replica at relu1_1/relu2_1/relu3_1."""
    from c2matching_tpu.models.archs import VGGFeatureExtractor
    from c2matching_tpu.utils.pth_import import import_torchvision_vgg

    torch.manual_seed(1)
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
           512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']
    layers, in_c = [], 3
    for v in cfg:
        if v == 'M':
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, 1, 1), tnn.ReLU(True)]
            in_c = v
    features = tnn.Sequential(*layers)
    path = str(tmp_path / 'vgg19.pth')
    torch.save({f'features.{i}.{k}': v for i, m in enumerate(features)
                for k, v in m.state_dict().items()}, path)

    variables = import_torchvision_vgg(path, 'vgg19')

    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    timg = torch.from_numpy(
        ((img - mean) / std).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        x = timg
        acts = {}
        for i, m in enumerate(features):
            x = m(x)
            if i == 1:
                acts['relu1_1'] = x
            if i == 6:
                acts['relu2_1'] = x
            if i == 11:
                acts['relu3_1'] = x
            if i >= 11:
                break

    vgg = VGGFeatureExtractor(
        layer_name_list=['relu1_1', 'relu2_1', 'relu3_1'], vgg_type='vgg19')
    # keep only needed layers from the imported tree
    needed = {k: v for k, v in variables['params'].items()
              if k in ('conv1_1', 'conv1_2', 'conv2_1', 'conv2_2', 'conv3_1')}
    out = vgg.apply({'params': jax.tree.map(jnp.asarray, needed)},
                    jnp.asarray(img))
    for k in acts:
        np.testing.assert_allclose(
            np.asarray(out[k]), acts[k].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_restoration_net_import_shapes(tmp_path):
    """Synthesize a torch-format RestorationNet state dict, import, and
    run the flax forward (shape/finite check; DCN math is oracle-tested
    separately)."""
    from c2matching_tpu.models.archs import RestorationNet
    from c2matching_tpu.utils.pth_import import import_restoration_net

    ngf, nb, g = 64, 16, 8
    state = {}

    def add_conv(name, cin, cout):
        state[f'{name}.weight'] = torch.randn(cout, cin, 3, 3) * 0.02
        state[f'{name}.bias'] = torch.zeros(cout)

    add_conv('content_extractor.conv_first', 3, ngf)
    for i in range(nb):
        add_conv(f'content_extractor.body.{i}.conv1', ngf, ngf)
        add_conv(f'content_extractor.body.{i}.conv2', ngf, ngf)
    for scale, ch in (('small', 256), ('medium', 128), ('large', 64)):
        add_conv(f'dyn_agg_restore.{scale}_offset_conv1', ngf + ch, ch)
        add_conv(f'dyn_agg_restore.{scale}_offset_conv2', ch, ch)
        agg = f'dyn_agg_restore.{scale}_dyn_agg'
        state[f'{agg}.weight'] = torch.randn(ch, ch, 3, 3) * 0.01
        state[f'{agg}.bias'] = torch.zeros(ch)
        add_conv(f'{agg}.conv_offset_mask', ch, g * 3 * 9)
        add_conv(f'dyn_agg_restore.head_{scale}.0', ngf + ch, ngf)
        for i in range(nb):
            add_conv(f'dyn_agg_restore.body_{scale}.{i}.conv1', ngf, ngf)
            add_conv(f'dyn_agg_restore.body_{scale}.{i}.conv2', ngf, ngf)
        if scale != 'large':
            add_conv(f'dyn_agg_restore.tail_{scale}.0', ngf, ngf * 4)
    add_conv('dyn_agg_restore.tail_large.0', ngf, ngf // 2)
    add_conv('dyn_agg_restore.tail_large.2', ngf // 2, 3)

    path = str(tmp_path / 'net_g.pth')
    torch.save(state, path)
    variables = import_restoration_net(path)

    net = RestorationNet()
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (1, 16, 16, 3))
    pre_offset = {
        'relu3_1': jnp.zeros((1, 9, 16, 16, 2)),
        'relu2_1': jnp.zeros((1, 9, 32, 32, 2)),
        'relu1_1': jnp.zeros((1, 9, 64, 64, 2)),
    }
    ref_feat = {
        'relu3_1': jax.random.uniform(rng, (1, 16, 16, 256)),
        'relu2_1': jax.random.uniform(rng, (1, 32, 32, 128)),
        'relu1_1': jax.random.uniform(rng, (1, 64, 64, 64)),
    }
    # structural compatibility with a fresh init
    ref_params = net.init(rng, lr_img, pre_offset, ref_feat)
    imported = jax.tree.map(jnp.asarray, variables)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: a.shape, imported)
    assert ref_shapes == got_shapes
    out = net.apply(imported, lr_img, pre_offset, ref_feat)
    assert out.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))
