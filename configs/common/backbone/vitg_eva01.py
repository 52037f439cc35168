# EVA-01 ViT-g backbone (reference: configs/common/backbone/vitg_eva01.py —
# 1408d/40L/16H, plain GELU MLP ratio 6144/1408, decomposed rel-pos (the real
# one: vit_eva.py), beit-style q/v bias, window 16 with every 4th block
# global, drop_path 0.6, frozen patch embed).
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
        window_size=16,
        window_block_indexes=tuple(
            i for i in range(40) if (i + 1) % 4 != 0
        ),
        pretrain_img_size=224,
        rope=False,
        mlp_type="gelu",
        use_rel_pos=True,
        drop_path_rate=0.6,
    ),
    out_channels=256,
)
