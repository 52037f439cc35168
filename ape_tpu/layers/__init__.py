from .align import StillClassifier, VisionLanguageAlign, ZeroShotFC
from .common import FFN, MLP, MultiheadAttention
from .fuse import BiAttentionBlock, BiMultiHeadAttention, VisionLanguageFusion
from .msda_module import MultiScaleDeformableAttention

__all__ = [
    "FFN",
    "MLP",
    "MultiheadAttention",
    "BiAttentionBlock",
    "BiMultiHeadAttention",
    "VisionLanguageFusion",
    "MultiScaleDeformableAttention",
    "StillClassifier",
    "VisionLanguageAlign",
    "ZeroShotFC",
]
