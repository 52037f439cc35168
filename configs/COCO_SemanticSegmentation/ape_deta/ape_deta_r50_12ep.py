# Auto-generated task config mirroring the reference
# configs/COCO_SemanticSegmentation/ape_deta/ape_deta_r50_12ep.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta_r50.py"))
model = _base.model

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco_semantic_lsj1024.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 53

language = dict(
    width=768, heads=12, layers=12, output_dim=1024,
    bpe_path=os.environ.get("CLIP_BPE_PATH", ""), max_batch_size=2560,
)

optimizer = dict(
    base_lr=2e-4,
    weight_decay=0.0001,
    grad_clip=0.1,
    vit_num_layers=0,
    layer_decay=1.0,
    backbone_lr_mult=0.1,
    milestones=[75000, 90000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_r50_12ep",
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
    num_text=64,
    text_dim=1024,
)

# ---- recipe facts extracted from the reference config
# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----
train["instance_on"] = False
train["semantic_on"] = True
train["panoptic_on"] = False
