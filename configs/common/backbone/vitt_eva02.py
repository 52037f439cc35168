# EVA-02-Ti backbone + SimpleFeaturePyramid (reference:
# configs/common/backbone/vitt_eva02.py — 192d/12L/3H, window 14, packed SwiGLU)
from ape_tpu.config import L
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=192,
        depth=12,
        num_heads=3,
        mlp_ratio=4 * 2 / 3,
        window_size=14,
        window_block_indexes=tuple(
            i for i in range(12) if i not in (2, 5, 8, 11)
        ),
        pretrain_img_size=224,
        pt_hw_seq_len=16,
        packed_swiglu=True,
        drop_path_rate=0.0,
    ),
    out_channels=256,
)
