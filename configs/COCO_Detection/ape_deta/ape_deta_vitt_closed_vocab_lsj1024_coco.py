# Closed-vocabulary legacy-deta COCO detection: the VisionLanguageAlign head
# runs against a LEARNED 80-class embedding bank instead of encoded text —
# the TPU-native equivalent of the reference's fixed-category deta head
# (reference: ape/modeling/deta/deformable_detr.py + zero_shot_fc.py
# zs_weight_path='rand'; the legacy configs/COCO_Detection deta tree).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR
from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion
from ape_tpu.modeling.build import build_ape_ti

model = L(build_ape_ti)(
    img_size=1024,
    num_queries=900,
    mask_on=False,
    num_learned_classes=80,  # closed vocab: no text encoder at all
)

criterion = L(DeformableCriterion)(
    num_classes=80,
    weight_dict={
        "loss_class": 1.0,
        "loss_bbox": 5.0,
        "loss_giou": 2.0,
    },
    losses=["class", "boxes"],
    num_queries=900,
)

optimizer = dict(
    base_lr=2e-4, weight_decay=0.05, grad_clip=0.1, vit_num_layers=12,
    layer_decay=0.9, milestones=[75000], warmup_steps=1000,
)

train = dict(
    output_dir="./output/coco_closed_vocab",
    max_iter=90000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=0,
    iter_size=1,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1024,
    num_text=80,
    text_dim=1024,
)

dataloader = dict(
    train=dict(
        dataset_names=["coco_2017_train"],
        mapper=L(DatasetMapperDETR)(is_train=True, image_size=1024),
        batch_size=1,
        sampler="TrainingSampler",
    ),
    tests=[
        dict(
            dataset_name="coco_2017_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
            iou_types=("bbox",),
        ),
    ],
)
