# Auto-generated task config mirroring the reference
# configs/ADE20k_SemanticSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitl_eva02_clip.py"))
model = _base.model
model.backbone = _bb.backbone
model.transformer.encoder.vl_fusion = True
model.transformer.encoder.vl_embed_dim = 2048
model.transformer.encoder.vl_init_values = 1.0 / 6
model.transformer.encoder.use_act_checkpoint = True

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/ade20k_semantic_lsj1024.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 150

language = dict(
    width=1024, heads=16, layers=24, output_dim=1024,
    bpe_path=os.environ.get("CLIP_BPE_PATH", ""), max_batch_size=256,
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
    output_dir="./output/ape_deta_vitl_eva02_clip_vlf_lsj1024",
    max_iter=90000,
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
)

# ---- recipe facts extracted from the reference config
# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----
train["name_prompt_fusion_type"] = "zero"
