# APE-Ti COCO instance segmentation, LSJ 1024, 12ep schedule (reference:
# configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_lsj1024_cp_12ep.py
# recipe with the vitt backbone).
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitt_eva02.py"))
_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco.py"))

model = _base.model
model.backbone = _bb.backbone
criterion = _base.criterion
criterion.num_classes = 80

dataloader = _data.dataloader

optimizer = dict(
    base_lr=2e-4,
    weight_decay=0.05,
    grad_clip=0.1,
    vit_num_layers=12,
    layer_decay=0.8,
    milestones=[75000, 85000],
    warmup_steps=1000,
)

train = dict(
    output_dir="./output/ape_deta_vitt_coco_12ep",
    max_iter=90000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=10000,
    iter_size=1,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1024,
    num_text=80,
    text_dim=1024,
)
