# EVA-02 ViT-L backbone, non-CLIP flavor (reference: configs/common/backbone/
# vitl_eva02.py — 1024d/24L/16H, window 16 with every 6th block global,
# subln q/k/v + naiveswiglu ffn_ln, RoPE, drop_path 0.4; the use_rel_pos flag
# there is dead — vit_eva02.Attention never consumes it).
from ape_tpu.config import L
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_ratio=4 * 2 / 3,
        window_size=16,
        window_block_indexes=tuple(
            i for i in range(24) if (i + 1) % 6 != 0
        ),
        pretrain_img_size=224,
        pt_hw_seq_len=16,
        subln=True,
        swiglu_subln=True,
        drop_path_rate=0.4,
    ),
    out_channels=256,
)
