from .criterion import DeformableCriterion, default_weight_dict
from .model import APEDeta, ChannelMapper
from .postprocess import (
    get_stuff_score,
    instance_inference,
    panoptic_scores,
    semantic_inference,
)
from .transformer import (
    DeformableDetrTransformer,
    DeformableTransformerDecoder,
    DeformableTransformerEncoder,
)
