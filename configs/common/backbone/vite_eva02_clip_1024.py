# EVA-02-CLIP ViT-E backbone (reference: configs/common/backbone/
# vite_eva02_clip_1024.py — 1792d/64L/16H, window 32, postnorm block layout,
# no RoPE, every 4th block global). Used by the ViT-E FSDP training configs.
from ape_tpu.config import L
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=1792,
        depth=64,
        num_heads=16,
        mlp_ratio=8.571428571428571,
        window_size=32,
        window_block_indexes=tuple(
            i for i in range(64) if (i + 1) % 4 != 0
        ),
        pretrain_img_size=224,
        rope=False,
        use_rel_pos=True,
        mlp_type="gelu",
        postnorm=True,
        drop_path_rate=0.4,
    ),
    out_channels=256,
)
