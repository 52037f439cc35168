# Auto-generated task config mirroring the reference
# configs/LVISCOCOCOCOSTUFF_PanopticSegmentation/ape_deta/ape_deta_vitl_eva02_lsj1024_cp_24ep.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitl_eva02.py"))
model = _base.model
model.backbone = _bb.backbone

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/lviscocococostuff_panoptic_lsj1024_cp.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 1256
criterion.use_fed_loss = True
criterion.fed_loss_num_classes = 50
criterion.fed_loss_cls_weights = L(fed_loss_cls_weights)(dataset="lvis_v1_train")
criterion.fed_loss_pad_type = "cat"

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
    milestones=[150000, 180000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_vitl_eva02_lsj1024_cp_24ep",
    max_iter=180000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=20000,
    iter_size=1,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1024,
    num_text=1280,
    text_dim=1024,
)

# ---- recipe facts extracted from the reference config
# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----
model.num_classes = 1256
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = False
if criterion.get('use_fed_loss', False) and 1256 < {"lvis_v1_train": 1203, "openimages_v6": 601}.get(
    criterion.fed_loss_cls_weights.dataset, 0
):
    criterion.use_fed_loss = False
    criterion.fed_loss_cls_weights = None
criterion.num_classes = 1256
