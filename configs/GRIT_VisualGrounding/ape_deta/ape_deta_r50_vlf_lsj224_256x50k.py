# Auto-generated task config mirroring the reference
# configs/GRIT_VisualGrounding/ape_deta/ape_deta_r50_vlf_lsj224_256x50k.py (same recipe expressed against this repo's model tree;
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

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/grit_instance_lsj224.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 256

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
    output_dir="./output/ape_deta_r50_vlf_lsj224_256x50k",
    max_iter=10000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=1000,
    iter_size=5,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=224,
    num_text=256,
    text_dim=1024,
)

# ---- recipe facts extracted from the reference config
# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----
train["name_prompt_fusion_type"] = "zero"
