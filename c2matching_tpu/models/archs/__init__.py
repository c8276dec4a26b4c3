"""Network architectures (flax.linen, NHWC), registered by class name for
string-typed YAML dispatch — the decorator-registry replacement for the
reference's *_arch.py directory scan (mmsr/models/archs/__init__.py:9-18).
"""
from .arch_util import (ResBlockStack, ResidualBlockNoBN,
                        ResidualBlockWithBN, Upsample)
from .dcn_arch import DCN, DCNSep, DCNv2Module
from .corres_generation_arch import CorrespondenceGenerationArch
from .discriminator_arch import ImageDiscriminator
from .ref_restoration_arch import (ContentExtractor,
                                   DynamicAggregationRestoration, DynAgg,
                                   RestorationNet)
from .vgg_arch import (ContrasExtractorLayer, ContrasExtractorSep,
                       VGGFeatureExtractor)

__all__ = [
    'ResBlockStack', 'ResidualBlockNoBN',
    'ResidualBlockWithBN', 'Upsample', 'DCN', 'DCNSep',
    'DCNv2Module', 'CorrespondenceGenerationArch',
    'ImageDiscriminator', 'ContentExtractor',
    'DynamicAggregationRestoration', 'DynAgg', 'RestorationNet',
    'ContrasExtractorLayer', 'ContrasExtractorSep', 'VGGFeatureExtractor',
]
