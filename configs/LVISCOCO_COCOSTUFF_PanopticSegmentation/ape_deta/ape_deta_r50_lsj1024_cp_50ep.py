# Auto-generated task config mirroring the reference
# configs/LVISCOCO_COCOSTUFF_PanopticSegmentation/ape_deta/ape_deta_r50_lsj1024_cp_50ep.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta_r50.py"))
model = _base.model

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/lviscoco_cocostuff_panoptic_lsj1024_cp.py"))
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
    weight_decay=0.0001,
    grad_clip=0.1,
    vit_num_layers=0,
    layer_decay=1.0,
    backbone_lr_mult=0.1,
    milestones=[330000, 375000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_r50_lsj1024_cp_50ep",
    max_iter=375000,
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
model.num_classes = 1203
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = False
train["select_box_nums_for_evaluation"] = 300
_ref_crit_nc = [1203, 54]
criterions = [criterion.clone() for _ in _ref_crit_nc]
_FED_LEN = {"lvis_v1_train": 1203, "openimages_v6": 601}
for _c, _nc in zip(criterions, _ref_crit_nc):
    if _c.get('use_fed_loss', False) and _nc < _FED_LEN.get(
        _c.fed_loss_cls_weights.dataset, 0
    ):
        _c.use_fed_loss = False
        _c.fed_loss_cls_weights = None
    _c.num_classes = _nc
criterion = criterions[0]
