from .deform_conv import (deform_conv, deform_psroi_pooling,
                          modulated_deform_conv,
                          modulated_deform_conv_reference,
                          torch_weight_to_kco)
from .flow import (batched_pre_offsets, flow_warp, index_to_flow,
                   match_to_pre_offsets, resize_flow, shifted_offsets,
                   tensor_shift, upsample_flow)
from .patch_match import (batched_patch_match, normalize_per_pixel,
                          patch_match, unfold_descriptors)
from .resize import (bilinear_resize, nearest_up, pixel_shuffle,
                     pixel_unshuffle, upscale)

__all__ = [
    'deform_conv', 'deform_psroi_pooling',
    'modulated_deform_conv', 'modulated_deform_conv_reference',
    'torch_weight_to_kco', 'batched_pre_offsets',
    'flow_warp', 'index_to_flow', 'match_to_pre_offsets', 'resize_flow',
    'shifted_offsets', 'tensor_shift', 'upsample_flow',
    'batched_patch_match', 'normalize_per_pixel', 'patch_match',
    'unfold_descriptors', 'bilinear_resize', 'nearest_up',
    'pixel_shuffle', 'pixel_unshuffle', 'upscale',
]
