"""Deformable-conv module API surface.

Flax equivalents of the reference's torch module wrappers around the DCN
op — DCNv2 (raw offset/mask inputs), DCN (self-generated offsets), DCN_sep
(offsets from a separate feature) from mmsr/models/archs/DCNv2/dcn_v2.py
:56-184, and the modulated path of the vestigial mmdet-style extension
(mmsr/models/archs/dcn/deform_conv.py ModulatedDeformConv[Pack]). All wrap
c2matching_tpu.ops.deform_conv. ``DCN_sep_pre_multi_offset`` (the variant
the restoration net actually uses) lives in ref_restoration_arch.DynAgg.

Channel bookkeeping matches the CUDA kernel layout: learned conv emits
G*3*K channels chunked (o1, o2, mask); (o1 ++ o2) is read group-major with
(y, x) interleaved per tap == a reshape to (..., G, K, 2).
"""
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import modulated_deform_conv
from ...utils.registry import ARCH_REGISTRY


def _dcn_weight_init(cin, k=9):
    stdv = 1.0 / math.sqrt(cin * k)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


def split_offset_mask(out, g, k):
    """(B, H, W, 3*G*K) learned conv output -> offset (B,H,W,G,K,2[dy,dx])
    + sigmoid mask (B,H,W,G,K) with the torch chunk semantics
    (dcn_v2.py:233-245)."""
    b, h, w, _ = out.shape
    o1 = out[..., :g * k]
    o2 = out[..., g * k:2 * g * k]
    mask = nn.sigmoid(out[..., 2 * g * k:]).reshape(b, h, w, g, k)
    offset = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, g, k, 2)
    return offset, mask


class DCNv2Module(nn.Module):
    """Modulated deformable conv with caller-provided offset/mask
    (torch DCNv2, dcn_v2.py:56-95)."""
    channels: int
    out_channels: int = None
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask):
        cout = self.out_channels or self.channels
        weight = self.param('weight', _dcn_weight_init(self.channels),
                            (9, self.channels, cout))
        bias = self.param('bias', nn.initializers.zeros, (cout,))
        return modulated_deform_conv(x, offset, mask, weight, bias)


class DCN(nn.Module):
    """Self-generated offsets/mask (torch DCN, dcn_v2.py:98-133; also the
    mmdet ModulatedDeformConvPack surface)."""
    channels: int
    out_channels: int = None
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g, k = self.deformable_groups, 9
        out = nn.Conv(3 * g * k, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name='conv_offset_mask')(x)
        offset, mask = split_offset_mask(out, g, k)
        cout = self.out_channels or self.channels
        weight = self.param('weight', _dcn_weight_init(self.channels),
                            (9, self.channels, cout))
        bias = self.param('bias', nn.initializers.zeros, (cout,))
        return modulated_deform_conv(x, offset, mask, weight, bias)


@ARCH_REGISTRY.register
class DCNSep(nn.Module):
    """Offsets/mask predicted from a *different* feature (torch DCN_sep,
    dcn_v2.py:136-184 — the EDVR alignment pattern)."""
    channels: int
    out_channels: int = None
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, extra_feat):
        g, k = self.deformable_groups, 9
        out = nn.Conv(3 * g * k, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name='conv_offset_mask')(extra_feat)
        offset, mask = split_offset_mask(out, g, k)
        cout = self.out_channels or self.channels
        weight = self.param('weight', _dcn_weight_init(self.channels),
                            (9, self.channels, cout))
        bias = self.param('bias', nn.initializers.zeros, (cout,))
        return modulated_deform_conv(x, offset, mask, weight, bias)
