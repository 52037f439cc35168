# EVA-02 ViT-L at LSJ 1536 (reference: configs/common/backbone/
# vitl_eva02_1536.py — window 32 with every 3rd block global, else as 1024).
from ape_tpu.config import L
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1536,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_ratio=4 * 2 / 3,
        window_size=32,
        window_block_indexes=tuple(
            i for i in range(24) if (i + 1) % 3 != 0
        ),
        pretrain_img_size=224,
        pt_hw_seq_len=16,
        subln=True,
        swiglu_subln=True,
        drop_path_rate=0.4,
    ),
    out_channels=256,
)
