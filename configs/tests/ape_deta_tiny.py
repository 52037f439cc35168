# Tiny end-to-end config for smoke tests / CI: full pipeline, minutes not hours.
from ape_tpu.config import L
from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion
from ape_tpu.modeling.ape_deta.model import APEDeta, ChannelMapper
from ape_tpu.modeling.ape_deta.transformer import (
    DeformableDetrTransformer,
    DeformableTransformerDecoder,
    DeformableTransformerEncoder,
)
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

model = L(APEDeta)(
    backbone=L(SimpleFeaturePyramid)(
        net=L(EVAViT)(
            img_size=64,
            embed_dim=64,
            depth=2,
            num_heads=2,
            window_size=2,
            window_block_indexes=(0,),
            pretrain_img_size=32,
            packed_swiglu=True,
        ),
        out_channels=64,
        scale_factors=(4.0, 2.0, 1.0),
        top_block=False,
    ),
    neck=L(ChannelMapper)(out_channels=64),
    transformer=L(DeformableDetrTransformer)(
        encoder=L(DeformableTransformerEncoder)(
            embed_dim=64,
            num_heads=2,
            feedforward_dim=128,
            num_layers=2,
            num_feature_levels=3,
            window_radius=1,
            embed_dim_language=256,
        ),
        decoder=L(DeformableTransformerDecoder)(
            embed_dim=64, num_heads=2, feedforward_dim=128, num_layers=2,
            num_feature_levels=3,
        ),
        num_feature_levels=3,
        two_stage_num_proposals=24,
        pre_nms_topk=64,
    ),
    embed_dim=64,
    embed_dim_language=256,
    in_features=("p2", "p3", "p4"),
    num_queries=24,
)

criterion = L(DeformableCriterion)(
    num_classes=8,
    weight_dict={
        "loss_class": 1.0,
        "loss_bbox": 5.0,
        "loss_giou": 2.0,
        "loss_mask": 5.0,
        "loss_dice": 5.0,
    },
    losses=["class", "boxes", "masks"],
    num_queries=24,
)

optimizer = dict(
    base_lr=1e-4, weight_decay=0.01, grad_clip=0.1, vit_num_layers=2,
    layer_decay=0.9, milestones=[], warmup_steps=0,
)

train = dict(
    output_dir="./output/tiny_smoke",
    max_iter=20,
    checkpoint_period=1000,
    log_period=5,
    eval_period=1000,
    iter_size=1,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=True),
    image_size=64,
    num_text=8,
    text_dim=256,
)

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=2, sampler="TrainingSampler"),
    tests=[],
)
