# Auto-generated task config mirroring the reference
# configs/COCO_SA1B_PanopticSegmentation/ape_deta/ape_deta_r50_24ep_vlf_lp.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta_r50.py"))
model = _base.model
model.transformer.encoder.vl_fusion = True
model.transformer.encoder.vl_embed_dim = 2048
model.transformer.encoder.vl_init_values = 1.0 / 6
model.transformer.encoder.use_act_checkpoint = True

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco_sa1b_panoptic.py"))
dataloader = _data.dataloader

criterions = []
_TAGS = ['cocopan', 'sa1b']
_INFO = {
    'cocopan': (133, None),
    'sa1b': (1, None),
}
for _tag in _TAGS:
    _nc, _fedw = _INFO[_tag]
    c = _base.criterion.clone()
    c.num_classes = _nc
    if _fedw is not None:
        c.use_fed_loss = True
        c.fed_loss_num_classes = 50
        c.fed_loss_cls_weights = L(fed_loss_cls_weights)(dataset=_fedw)
        if _tag == "lviscoco":
            c.fed_loss_pad_type = "cat"
    if _tag in ("vg", "gqa", "phrasecut", "flickr"):
        c.weight_dict = dict(c.weight_dict)
        c.weight_dict["loss_class_enc"] = 0.0
    if _tag == "sa1b":
        c.weight_dict = dict(c.weight_dict)
        c.weight_dict["loss_class"] = 0.0
    criterions.append(c)
criterion = criterions[0]

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
    milestones=[150000, 180000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_r50_24ep_vlf_lp",
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
    num_text=160,
    text_dim=1024,
    dataset_ratio=[1.0, 1.0],
)

# ---- recipe facts extracted from the reference config
# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----
model.num_classes = 133
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = True
_ref_crit_nc = [133, 1]
while len(criterions) < len(_ref_crit_nc):
    _extra = criterions[0].clone()
    _extra.use_fed_loss = False
    _extra.fed_loss_cls_weights = None
    criterions.append(_extra)
_FED_LEN = {"lvis_v1_train": 1203, "openimages_v6": 601}
for _c, _nc in zip(criterions, _ref_crit_nc):
    if _c.get('use_fed_loss', False) and _nc < _FED_LEN.get(
        _c.fed_loss_cls_weights.dataset, 0
    ):
        _c.use_fed_loss = False
        _c.fed_loss_cls_weights = None
    _c.num_classes = _nc
