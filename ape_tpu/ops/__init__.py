from . import box_ops, misc, msda, nms, posemb
from .box_ops import (
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
)
from .misc import inverse_sigmoid, sigmoid_focal_loss
from .msda import ms_deform_attn
from .nms import batched_nms_mask, nms_mask, nms_topk
from .posemb import get_sine_pos_embed, position_embedding_sine
