"""VGG feature extractors (flax.linen, NHWC).

Parity target: mmsr/models/archs/vgg_arch.py (NAMES table :7-37,
VGGFeatureExtractor :59-145). The torchvision-pretrained weights are not
bundled; load them with c2matching_tpu.utils.pth_import from a
user-provided torchvision VGG state_dict (.pth) — layer-slice semantics
(prefix up to the deepest requested layer, *inclusive*) are preserved so
imported weights line up 1:1.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import ARCH_REGISTRY
from .arch_util import halve_valid, valid_mask

# Layer name sequences per VGG variant (vgg_arch.py:7-37).
NAMES = {
    'vgg11': [
        'conv1_1', 'relu1_1', 'pool1', 'conv2_1', 'relu2_1', 'pool2',
        'conv3_1', 'relu3_1', 'conv3_2', 'relu3_2', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'pool5'
    ],
    'vgg13': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'pool3', 'conv4_1', 'relu4_1', 'conv4_2',
        'relu4_2', 'pool4', 'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2',
        'pool5'
    ],
    'vgg16': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3', 'relu4_3', 'pool4',
        'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3',
        'pool5'
    ],
    'vgg19': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'conv3_4', 'relu3_4',
        'pool3', 'conv4_1', 'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3',
        'relu4_3', 'conv4_4', 'relu4_4', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3', 'conv5_4', 'relu5_4',
        'pool5'
    ],
}

_BLOCK_CHANNELS = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

# ImageNet normalization for [0, 1] inputs (vgg_arch.py:125-133).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_out_channels(name):
    return _BLOCK_CHANNELS[int(name[4])]


def vgg_layer_prefix(vgg_type, last_layer):
    """The layer-name prefix up to and including ``last_layer``."""
    names = NAMES[vgg_type]
    return names[:names.index(last_layer) + 1]


@ARCH_REGISTRY.register
class VGGFeatureExtractor(nn.Module):
    """Truncated VGG returning a dict of named activations.

    Args mirror the reference constructor (vgg_arch.py:80-86); the network
    only materializes layers up to the deepest requested one.
    """
    layer_name_list: Sequence[str]
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    remove_pooling: bool = False
    pooling_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid_shape=None):
        """x: (B, H, W, 3) RGB in [0, 1]. Returns {layer_name: feature}.

        ``valid_shape`` (vh, vw) enables the bucket-padding invariance
        protocol (arch_util.valid_mask): each conv output is re-zeroed
        in the pad bands so valid-region activations equal the
        exact-shape run's. None (training / exact shapes) is a no-op.
        """
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        if valid_shape is not None:
            x = x * valid_mask(x, valid_shape)

        if valid_shape is not None and self.pooling_stride != 2:
            # a stride!=2 size-2 pool SHIFTS the valid region (row vh-1
            # maxes over the pad row vh), and halve_valid below only
            # models the stride-2 case — the pad-invariance guarantee
            # would silently break, so reject the combination outright
            raise NotImplementedError(
                'valid_shape masking is only defined for pooling_stride'
                f'=2, got {self.pooling_stride}')

        names = NAMES[self.vgg_type]
        max_idx = max(names.index(v) for v in self.layer_name_list)
        wanted = set(self.layer_name_list)

        output = {}
        for name in names[:max_idx + 1]:
            if name.startswith('conv'):
                x = nn.Conv(_conv_out_channels(name), (3, 3), padding=1,
                            dtype=self.dtype, name=name)(x)
                if valid_shape is not None:
                    x = x * valid_mask(x, valid_shape)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                if self.remove_pooling:
                    continue
                x = nn.max_pool(x, (2, 2),
                                strides=(self.pooling_stride,
                                         self.pooling_stride))
                if self.pooling_stride == 2:
                    valid_shape = halve_valid(valid_shape)
            if name in wanted:
                output[name] = x
        return output


class ContrasExtractorLayer(nn.Module):
    """VGG16 prefix up to and including conv3_1 (pre-activation output),
    with ImageNet input normalization
    (contras_extractor_arch.py:8-41 — note the slice excludes relu3_1).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid_shape=None):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        if valid_shape is not None:
            x = x * valid_mask(x, valid_shape)
        for name in vgg_layer_prefix('vgg16', 'conv3_1'):
            if name.startswith('conv'):
                x = nn.Conv(_conv_out_channels(name), (3, 3), padding=1,
                            dtype=self.dtype, name=name)(x)
                if valid_shape is not None:
                    x = x * valid_mask(x, valid_shape)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                valid_shape = halve_valid(valid_shape)
        return x


@ARCH_REGISTRY.register
class ContrasExtractorSep(nn.Module):
    """Two separate (non-shared) contrastive extractors for input vs ref
    (contras_extractor_arch.py:44-59)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, valid_shape=None):
        f1 = ContrasExtractorLayer(dtype=self.dtype,
                                   name='feature_extraction_image1')(
                                       image1, valid_shape)
        f2 = ContrasExtractorLayer(dtype=self.dtype,
                                   name='feature_extraction_image2')(
                                       image2, valid_shape)
        return {'dense_features1': f1, 'dense_features2': f2}
