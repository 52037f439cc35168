# EVA-01-CLIP ViT-g backbone (reference: configs/common/backbone/
# vitg_eva01_clip_1024.py — vit_eva_clip module: 1408d/40L/16H, plain GELU
# MLP, window 32, NO rope and NO rel-pos (absolute pos embed only; the
# config's use_rel_pos flag is dead in vit_eva_clip.Attention), drop_path 0.6).
from ape_tpu.config import L
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

backbone = L(SimpleFeaturePyramid)(
    net=L(EVAViT)(
        img_size=1024,
        patch_size=16,
        embed_dim=1408,
        depth=40,
        num_heads=16,
        mlp_ratio=6144 / 1408,
        window_size=32,
        window_block_indexes=tuple(
            i for i in range(40) if (i + 1) % 4 != 0
        ),
        pretrain_img_size=224,
        rope=False,
        mlp_type="gelu",
        drop_path_rate=0.6,
    ),
    out_channels=256,
)
