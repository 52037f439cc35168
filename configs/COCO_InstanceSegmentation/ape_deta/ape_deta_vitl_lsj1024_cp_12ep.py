# Auto-generated task config mirroring the reference
# configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitl_lsj1024_cp_12ep.py (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)

_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

model = _base.model
model.backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        window_size=14,
        window_block_indexes=tuple(
            i for i in range(24) if (i + 1) % 6 != 0
        ),
        rope=False,
        use_rel_pos=True,
        mlp_type="gelu",
        pretrain_img_size=224,
    ),
    out_channels=256,
)

_data = LazyConfig.load(os.path.join(_dir, "../../common/data/coco_instance_lsj1024_cp.py"))
dataloader = _data.dataloader

criterion = _base.criterion
criterion.num_classes = 80

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
    output_dir="./output/ape_deta_vitl_lsj1024_cp_12ep",
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
    num_text=96,
    text_dim=1024,
)
