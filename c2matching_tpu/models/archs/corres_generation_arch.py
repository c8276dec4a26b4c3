"""Correspondence generation: dense matching -> multi-scale pre-offsets.

Parity target: mmsr/models/archs/corres_generation_arch.py (:14-117).
TPU redesign: the per-image Python loop (:52) becomes a vmap'd batched
patch match (one MXU correlation matmul per image), and the
index->flow->9-shifted-candidates chain is fully vectorized
(c2matching_tpu.ops.flow). The module itself has no trainable parameters
in the matching part; it carries the frozen VGG19 used to extract the HR
reference features handed to the restoration net (:116).
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.flow import batched_pre_offsets
from ...ops.patch_match import batched_patch_match
from ...utils.registry import ARCH_REGISTRY
from .vgg_arch import VGGFeatureExtractor


@ARCH_REGISTRY.register
class CorrespondenceGenerationArch(nn.Module):
    """Match contrastive features, emit 9-candidate offsets + ref features.

    Inputs/outputs mirror the reference forward (:48-117):
        dense_features: {'dense_features1': (B,H,W,C) input-branch feats,
                         'dense_features2': (B,H,W,C) ref-branch feats}
        img_ref_hr: (B, 4H, 4W, 3) HR reference image in [0, 1].
    Returns:
        pre_offset: {relu3_1: (B,9,H,W,2), relu2_1: (B,9,2H,2W,2),
                     relu1_1: (B,9,4H,4W,2)}, last dim (x, y).
        img_ref_feat: VGG19 activations of img_ref_hr at the three layers.
    """
    patch_size: int = 3
    stride: int = 1
    vgg_layer_list: Sequence[str] = ('relu3_1', 'relu2_1', 'relu1_1')
    vgg_type: str = 'vgg19'
    dtype: Any = jnp.float32
    # dtype of the correlation-matmul operands only (serving knob, like
    # RestorationNet.gather_dtype): 'bfloat16' runs the match matmul
    # single-pass on the MXU. Accumulation/normalization stay f32; only
    # near-tie matches can flip. None = descriptor dtype (f32).
    match_dtype: Any = None

    @nn.compact
    def __call__(self, dense_features, img_ref_hr, valid_shape=None):
        """``valid_shape`` (vh, vw): valid HR sizes when the batch is
        bucket-padded (eval invariance protocol) — threaded as the
        LR-scale (vh//4, vw//4) to the matcher (whose features are at
        HR/4) and as-is to the reference VGG (masked per layer)."""
        feat_in = dense_features['dense_features1']
        feat_ref = dense_features['dense_features2']

        lr_valid = None
        if valid_shape is not None:
            lr_valid = (valid_shape[0] // 4, valid_shape[1] // 4)
        max_idx, _max_val = batched_patch_match(
            feat_in, feat_ref, patch_size=self.patch_size,
            compute_dtype=self.match_dtype, valid_shape=lr_valid)
        pre_offset = batched_pre_offsets(max_idx,
                                         patch_size=self.patch_size,
                                         valid_shape=lr_valid)

        img_ref_feat = VGGFeatureExtractor(
            layer_name_list=list(self.vgg_layer_list),
            vgg_type=self.vgg_type, dtype=self.dtype,
            name='vgg')(img_ref_hr, valid_shape=valid_shape)
        return pre_offset, img_ref_feat
