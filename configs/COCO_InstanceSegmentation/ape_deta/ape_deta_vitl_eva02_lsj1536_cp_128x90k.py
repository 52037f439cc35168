# Auto-generated task config mirroring the reference
# configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_lsj1536_cp_128x90k.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitl_eva02_1536.py"))
model = _base.model
model.backbone = _bb.backbone

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco_instance_lsj1536_cp.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 80

language = dict(
    width=768, heads=12, layers=12, output_dim=1024,
    bpe_path=os.environ.get("CLIP_BPE_PATH", ""), max_batch_size=2560,
)

optimizer = dict(
    base_lr=2e-4,
    weight_decay=0.05,
    grad_clip=0.1,
    vit_num_layers=24,
    layer_decay=0.8,
    milestones=[75000, 90000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_vitl_eva02_lsj1536_cp_128x90k",
    max_iter=90000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=5000,
    iter_size=9,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1536,
    num_text=96,
    text_dim=1024,
)
