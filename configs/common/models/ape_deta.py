# Base APE-DETA model tree (reference:
# configs/COCO_InstanceSegmentation/ape_deta/models/ape_deta_r50.py:24-155 —
# 900 queries, 5 levels, two-stage + box refine, assign_first_stage, criterion
# weights class 1.0 / bbox 5.0 / giou 2.0 / mask 5 / dice 5).
from ape_tpu.config import L
from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion
from ape_tpu.modeling.ape_deta.model import APEDeta, ChannelMapper
from ape_tpu.modeling.ape_deta.transformer import (
    DeformableDetrTransformer,
    DeformableTransformerDecoder,
    DeformableTransformerEncoder,
)

model = L(APEDeta)(
    backbone=None,  # filled by the concrete config
    neck=L(ChannelMapper)(out_channels=256),
    transformer=L(DeformableDetrTransformer)(
        encoder=L(DeformableTransformerEncoder)(
            embed_dim=256,
            num_heads=8,
            feedforward_dim=2048,
            num_layers=6,
            num_feature_levels=5,
            window_radius=4,
            vl_fusion=False,
            embed_dim_language="${...embed_dim_language}",
        ),
        decoder=L(DeformableTransformerDecoder)(
            embed_dim=256,
            num_heads=8,
            feedforward_dim=2048,
            num_layers=6,
            num_feature_levels=5,
            look_forward_twice=False,  # reference default; no config ever enables it
        ),
        num_feature_levels=5,
        two_stage_num_proposals="${..num_queries}",
        assign_first_stage=True,
        pre_nms_topk=1000,
        nms_thresh_enc=0.9,
    ),
    embed_dim=256,
    embed_dim_language=1024,
    num_queries=900,
    mask_on=True,
)

criterion = L(DeformableCriterion)(
    num_classes=80,
    weight_dict={
        "loss_class": 1.0,
        "loss_bbox": 5.0,
        "loss_giou": 2.0,
        "loss_mask": 5.0,
        "loss_dice": 5.0,
    },
    losses=["class", "boxes", "masks"],
    num_queries="${model.num_queries}",
    alpha=0.25,
    gamma=2.0,
)
