"""Image discriminator for the stage-3 GAN.

Parity target: mmsr/models/archs/discriminator_arch.py (:6-40): five
conv-BN-LReLU double blocks (stride-2 second conv), global average pool,
1x1 convs to a sigmoid score. srntt normal(0, 0.02) init; BN scale
~ N(1, 0.02) (arch_util.srntt_init_weights :30-32).
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import ARCH_REGISTRY
from .arch_util import srntt_normal_init


@ARCH_REGISTRY.register
class ImageDiscriminator(nn.Module):
    in_nc: int = 3
    ndf: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=True):
        conv_kwargs = dict(kernel_init=srntt_normal_init(),
                           bias_init=nn.initializers.zeros, dtype=self.dtype)
        def bn_scale_init(key, shape, dtype=jnp.float32):
            # torch srntt init: BN weight ~ N(1.0, 0.02)
            return 1.0 + nn.initializers.normal(0.02)(key, shape, dtype)

        bn_kwargs = dict(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=bn_scale_init, dtype=self.dtype)

        feat = x
        channels = self.ndf
        for i in range(1, 6):
            feat = nn.Conv(channels, (3, 3), padding=1,
                           name=f'block{i}_conv1', **conv_kwargs)(feat)
            feat = nn.BatchNorm(name=f'block{i}_bn1', **bn_kwargs)(feat)
            feat = nn.leaky_relu(feat, negative_slope=0.2)
            feat = nn.Conv(channels, (3, 3), strides=(2, 2), padding=1,
                           name=f'block{i}_conv2', **conv_kwargs)(feat)
            feat = nn.BatchNorm(name=f'block{i}_bn2', **bn_kwargs)(feat)
            feat = nn.leaky_relu(feat, negative_slope=0.2)
            if i < 5:
                channels *= 2

        # AdaptiveAvgPool2d(1) + 1x1 convs (discriminator_arch.py:25-27)
        feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
        feat = nn.Conv(1024, (1, 1), name='out_conv1', **conv_kwargs)(feat)
        feat = nn.leaky_relu(feat, negative_slope=0.2)
        feat = nn.Conv(1, (1, 1), name='out_conv2', **conv_kwargs)(feat)
        return nn.sigmoid(feat)
