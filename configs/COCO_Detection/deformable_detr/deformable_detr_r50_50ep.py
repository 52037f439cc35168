# deformable detr r50 50ep
# (reference: configs/COCO_Detection/deformable_detr/deformable_detr_r50_50ep.py — the legacy
# closed-vocabulary Deformable-DETR family: learned 80-class bank, 300
# queries, single-stage learned queries, no box refinement).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta_r50.py"))

model = _base.model
model.num_learned_classes = 80
model.num_queries = 300
model.mask_on = False
model.transformer.two_stage_num_proposals = 300
model.transformer.as_two_stage = False
model.transformer.assign_first_stage = False
model.transformer.decoder.with_box_refine = False

criterion = _base.criterion
criterion.num_classes = 80
criterion.use_stage2 = False  # Hungarian matching on every layer (plain DETR)
criterion.losses = ["class", "boxes"]
criterion.weight_dict = {"loss_class": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco_instance_lsj1024.py"))
dataloader = _data.dataloader

optimizer = dict(
    base_lr=2e-4,
    weight_decay=1e-4,
    grad_clip=0.1,
    vit_num_layers=0,
    layer_decay=1.0,
    backbone_lr_mult=0.1,
    milestones=[330000, 375000],
    warmup_steps=0,
)

train = dict(
    output_dir="./output/deformable_detr_r50_50ep",
    max_iter=375000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=5000,
    iter_size=1,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1024,
    num_text=80,
    text_dim=1024,
)
