"""Restoration network with correspondence-seeded dynamic aggregation.

Parity target: mmsr/models/archs/ref_restoration_arch.py (ContentExtractor
:8-27, RestorationNet :30-65, DynamicAggregationRestoration :68-187) and the
DCN_sep_pre_multi_offset wrapper (DCNv2/dcn_v2.py:187-253), rebuilt on the
TPU-native modulated deformable conv op (c2matching_tpu.ops.deform_conv).

Init parity: srntt_init_weights normal(0, 0.02) over all convs
(ref_restoration_arch.py:39), conv_offset_mask layers zero-initialized
(:42-49), DynAgg main weight uniform(-1/sqrt(Cin*k*k), ..) with zero bias
(dcn_v2.py reset_parameters).

Param naming keeps the reference's substrings ('offset', 'small', 'medium')
so the 4-group optimizer split (ref_restoration_model.py:56-68) maps onto
flax param paths unchanged.
"""
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import modulated_deform_conv
from ...ops.resize import upscale
from ...utils.registry import ARCH_REGISTRY
from .arch_util import (ResBlockStack, lrelu, pixel_shuffle, scale_valid,
                        srntt_normal_init, valid_mask)


def _dcn_weight_init(cin, k=9):
    stdv = 1.0 / math.sqrt(cin * k)

    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)

    return init


class DynAgg(nn.Module):
    """DCN_sep_pre_multi_offset: modulated deformable conv whose offsets =
    learned residual (from a separate feature) + precomputed match offsets
    (dcn_v2.py:187-253).

    Channel bookkeeping matches the CUDA kernel's expected layout: the
    learned conv emits G*3*K channels chunked into (o1, o2, mask); the
    (o1 ++ o2) concatenation is read group-major with (y, x) interleaved
    per tap — here realized as a reshape to (..., G, K, 2).
    """
    channels: int
    deformable_groups: int = 8
    dtype: Any = jnp.float32
    # dtype for the deformable GATHER + weight contraction only (the
    # byte-bound hot path of eval; see ops/deform_conv.py). 'bfloat16'
    # halves the gathered bytes at ~0.4% relative feature rounding;
    # sampling coordinates stay f32 either way. None = ref_feat.dtype.
    gather_dtype: Any = None

    @nn.compact
    def __call__(self, ref_feat, offset_feat, pre_offset):
        """
        Args:
            ref_feat:    (B, H, W, C) feature to warp (ref VGG features).
            offset_feat: (B, H, W, C') feature the offsets are predicted
                         from (the 'extra_offset_mask' input).
            pre_offset:  (B, 9, H, W, 2) precomputed match offsets,
                         last dim (x, y) — reference order
                         (corres_generation_arch.py:106).
        Returns:
            (B, H, W, C) aggregated feature.
        """
        g = self.deformable_groups
        k = 9
        b, h, w, _ = offset_feat.shape

        out = nn.Conv(3 * g * k, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name='conv_offset_mask')(offset_feat)
        o1 = out[..., :g * k]
        o2 = out[..., g * k:2 * g * k]
        mask_raw = out[..., 2 * g * k:]

        # offsets are COORDINATES: always f32, even under a bf16 compute
        # dtype (bf16 coords on a 512-wide map are off by up to ~2px).
        offset = (jnp.concatenate([o1, o2], axis=-1)
                  .astype(jnp.float32).reshape(b, h, w, g, k, 2))
        # exploding-offset telemetry: the reference warns when the mean
        # |learned residual| exceeds 100 (dcn_v2.py:247-250). Sown here;
        # the train steps read it via mutable=['intermediates'] and the
        # MessageLogger emits the warning at print time (host side).
        self.sow('intermediates', 'offset_absmean',
                 jnp.mean(jnp.abs(offset)))
        mask = nn.sigmoid(mask_raw.astype(jnp.float32)).reshape(b, h, w,
                                                                g, k)

        # (B, 9, H, W, 2[x,y]) -> (B, H, W, 1, 9, 2[y,x]), broadcast over
        # groups (the torch repeat along dim1, dcn_v2.py:236-242).
        # The x/y swap is a stack of slices, NOT a reverse: a reversed
        # size-2 axis fused as a fusion input trips the TPU fusion
        # emitter's window bounds==strides check (bounds 2, stride 1).
        pre_t = pre_offset.transpose(0, 2, 3, 1, 4)
        pre = jnp.stack((pre_t[..., 1], pre_t[..., 0]), axis=-1)
        offset = offset + pre[:, :, :, None, :, :].astype(jnp.float32)

        weight = self.param(
            'weight', _dcn_weight_init(self.channels), (k, self.channels,
                                                        self.channels))
        bias = self.param('bias', nn.initializers.zeros, (self.channels,))
        ref_in = ref_feat
        if self.gather_dtype is not None:
            ref_in = ref_feat.astype(jnp.dtype(self.gather_dtype))
        out = modulated_deform_conv(ref_in, offset, mask, weight, bias)
        return out.astype(ref_feat.dtype)


class ContentExtractor(nn.Module):
    """conv + n residual blocks on the LR input
    (ref_restoration_arch.py:8-27). kernel_init is srntt-normal because
    RestorationNet re-initializes everything (:39)."""
    nf: int = 64
    n_blocks: int = 16
    dtype: Any = jnp.float32
    trunk_unroll: Any = 'auto'

    @nn.compact
    def __call__(self, x, mask=None):
        feat = nn.Conv(self.nf, (3, 3), padding=1,
                       kernel_init=srntt_normal_init(),
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name='conv_first')(x)
        feat = lrelu(feat)
        if mask is not None:
            feat = feat * mask
        return ResBlockStack(nf=self.nf, n_blocks=self.n_blocks,
                             kernel_init=srntt_normal_init(),
                             dtype=self.dtype, unroll=self.trunk_unroll,
                             name='body')(feat, mask)


class DynamicAggregationRestoration(nn.Module):
    """3-scale coarse-to-fine decoder with DynAgg at each scale
    (ref_restoration_arch.py:68-187).

    ``stage_barriers`` inserts jax.lax.optimization_barrier between the
    scales: the TPU fusion emitter miscompiles (bounds!=strides check
    abort) when producers from one scale fuse across into the next
    scale's gather fusions; the barrier pins the stage boundary. No
    effect on values.
    """
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    stage_barriers: bool = True
    dtype: Any = jnp.float32
    gather_dtype: Any = None
    trunk_unroll: Any = 'auto'

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat, valid_shape=None):
        """``valid_shape``: valid LR-scale sizes of a bucket-padded batch
        (eval invariance protocol): every conv output is re-zeroed in the
        pad bands (arch_util.valid_mask) so valid-region values equal the
        exact-shape run's. None (training / exact shapes) is a no-op."""
        conv_kwargs = dict(kernel_init=srntt_normal_init(),
                           bias_init=nn.initializers.zeros, dtype=self.dtype)
        ngf = self.ngf

        def scale_stage(x, scale_name, ref_key, ref_ch, tail, vs):
            mask = None if vs is None else valid_mask(x, vs)
            ref = img_ref_feat[ref_key]
            off = jnp.concatenate([x, ref], axis=-1)
            off = lrelu(nn.Conv(ref_ch, (3, 3), padding=1,
                                name=f'{scale_name}_offset_conv1',
                                **conv_kwargs)(off))
            if mask is not None:
                off = off * mask
            off = lrelu(nn.Conv(ref_ch, (3, 3), padding=1,
                                name=f'{scale_name}_offset_conv2',
                                **conv_kwargs)(off))
            if mask is not None:
                off = off * mask
            swapped = lrelu(DynAgg(channels=ref_ch,
                                   deformable_groups=self.groups,
                                   dtype=self.dtype,
                                   gather_dtype=self.gather_dtype,
                                   name=f'{scale_name}_dyn_agg')(
                                       ref, off, pre_offset[ref_key]))
            if mask is not None:
                swapped = swapped * mask
            h = jnp.concatenate([x, swapped], axis=-1)
            h = lrelu(nn.Conv(ngf, (3, 3), padding=1,
                              name=f'head_{scale_name}', **conv_kwargs)(h))
            if mask is not None:
                h = h * mask
            h = ResBlockStack(nf=ngf, n_blocks=self.n_blocks,
                              kernel_init=srntt_normal_init(),
                              dtype=self.dtype, unroll=self.trunk_unroll,
                              name=f'body_{scale_name}')(h, mask) + x
            return tail(h, mask)

        def tail_up(name):
            def tail(h, mask):
                h = nn.Conv(ngf * 4, (3, 3), padding=1,
                            name=f'tail_{name}', **conv_kwargs)(h)
                if mask is not None:
                    # masked at the coarse scale = masked after shuffle
                    h = h * mask
                return lrelu(pixel_shuffle(h, 2))
            return tail

        def tail_final(h, mask):
            h = lrelu(nn.Conv(ngf // 2, (3, 3), padding=1,
                              name='tail_large_conv1', **conv_kwargs)(h))
            if mask is not None:
                h = h * mask
            # final conv output is left unmasked: pad-band values are
            # cropped by the caller and feed nothing else
            return nn.Conv(3, (3, 3), padding=1, name='tail_large_conv2',
                           **conv_kwargs)(h)

        vs1 = valid_shape
        vs2 = scale_valid(vs1, 2)
        vs4 = scale_valid(vs1, 4)
        x = scale_stage(x, 'small', 'relu3_1', 256, tail_up('small'), vs1)
        if self.stage_barriers:
            x = jax.lax.optimization_barrier(x)
        x = scale_stage(x, 'medium', 'relu2_1', 128, tail_up('medium'),
                        vs2)
        if self.stage_barriers:
            x = jax.lax.optimization_barrier(x)
        x = scale_stage(x, 'large', 'relu1_1', 64, tail_final, vs4)
        return x


@ARCH_REGISTRY.register
class RestorationNet(nn.Module):
    """Top-level generator: content extractor + dynamic aggregation
    decoder + bilinear x4 base (ref_restoration_arch.py:30-65)."""
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    dtype: Any = jnp.float32
    gather_dtype: Any = None
    # lax.scan unroll factor for the residual trunks ('auto': full
    # unroll on XLA:CPU where the scanned conv backward is ~60x slower,
    # rolled elsewhere; serving sets 16 — rolled scan costs ~35% of
    # trunk time at eval scales; see arch_util.ResBlockStack).
    # Param/checkpoint layout is unaffected by the value.
    trunk_unroll: Any = 'auto'

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat, valid_shape=None):
        """
        Args:
            x: (B, h, w, 3) LR input.
            pre_offset: dict relu{1,2,3}_1 -> (B, 9, H_s, W_s, 2) offsets.
            img_ref_feat: dict relu{1,2,3}_1 -> (B, H_s, W_s, C_s) VGG
                features of the HR reference.
            valid_shape: None, or (vh, vw) valid LR sizes of a
                bucket-padded eval batch (invariance protocol — see
                DynamicAggregationRestoration).
        Returns:
            (B, 4h, 4w, 3) restored image.
        """
        base = upscale(x, 4, 'bilinear', valid_shape=valid_shape)
        mask = None if valid_shape is None else valid_mask(x, valid_shape)
        content_feat = ContentExtractor(nf=self.ngf, n_blocks=self.n_blocks,
                                        dtype=self.dtype,
                                        trunk_unroll=self.trunk_unroll,
                                        name='content_extractor')(x, mask)
        restored = DynamicAggregationRestoration(
            ngf=self.ngf, n_blocks=self.n_blocks, groups=self.groups,
            dtype=self.dtype, gather_dtype=self.gather_dtype,
            trunk_unroll=self.trunk_unroll,
            name='dyn_agg_restore')(content_feat, pre_offset,
                                    img_ref_feat, valid_shape)
        return restored + base
