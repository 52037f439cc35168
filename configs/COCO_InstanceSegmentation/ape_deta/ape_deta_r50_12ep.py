# APE-DETA r50, COCO instance segmentation, 12ep (reference:
# configs/COCO_InstanceSegmentation/ape_deta/ape_deta_r50_12ep.py — r50
# FrozenBN backbone, AdamW lr 2e-4 wd 1e-4, 0.1x backbone/offsets lr,
# milestones [75000, 90000], batch 16, EVA-01-CLIP text tower).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta_r50.py"))
_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco.py"))

model = _base.model
criterion = _base.criterion
criterion.num_classes = 80

dataloader = _data.dataloader

language = dict(
    width=1024,
    heads=16,
    layers=24,
    output_dim=1024,
    bpe_path=os.environ.get("CLIP_BPE_PATH", ""),
    max_batch_size=256,
)

optimizer = dict(
    base_lr=2e-4,
    weight_decay=1e-4,
    grad_clip=0.1,
    vit_num_layers=0,  # no ViT: flat lr + backbone_lr_mult instead
    layer_decay=1.0,
    backbone_lr_mult=0.1,
    milestones=[75000, 90000],
    warmup_steps=0,
)

train = dict(
    output_dir="./output/ape_deta_r50_coco_12ep",
    max_iter=90000,
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
