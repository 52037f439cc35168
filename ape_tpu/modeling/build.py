"""Model factories for the released APE variants.

Capability match: the backbone/transformer configs of the reference —
  * APE-Ti: configs/common/backbone/vitt_eva02.py (EVA-02-Ti 192d/12L/3H win14,
    packed SwiGLU) + ape_deta_r50.py transformer tree (6+6 layers, 900 queries)
  * APE-L_D: configs/common/backbone/vitl_eva02_clip.py (1024d/24L/16H win32,
    subln + naiveswiglu) + the flagship mdl config (VL fusion embed 2048,
    layer-scale 1/6, text dim 1024)
"""

from __future__ import annotations

import jax.numpy as jnp

from ape_tpu.modeling.ape_deta.model import APEDeta, ChannelMapper
from ape_tpu.modeling.ape_deta.transformer import (
    DeformableDetrTransformer,
    DeformableTransformerDecoder,
    DeformableTransformerEncoder,
)
from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid


def _window_indexes(depth: int):
    """2/3 windowed, every 3rd block global (vitt/vitl config pattern)."""
    return tuple(i for i in range(depth) if (i + 1) % 3 != 0)


def build_backbone_ti(img_size=1024, dtype=jnp.float32, scale_factors=(4.0, 2.0, 1.0, 0.5)):
    return SimpleFeaturePyramid(
        scale_factors=scale_factors,
        net=EVAViT(
            img_size=img_size,
            patch_size=16,
            embed_dim=192,
            depth=12,
            num_heads=3,
            mlp_ratio=4 * 2 / 3,
            window_size=14,
            window_block_indexes=_window_indexes(12),
            pretrain_img_size=224,
            pt_hw_seq_len=16,
            packed_swiglu=True,
            drop_path_rate=0.0,
            dtype=dtype,
        ),
        out_channels=256,
        dtype=dtype,
    )


def build_backbone_l(
    img_size=1024, dtype=jnp.float32, drop_path_rate=0.0,
    scale_factors=(4.0, 2.0, 1.0, 0.5),
):
    return SimpleFeaturePyramid(
        scale_factors=scale_factors,
        net=EVAViT(
            img_size=img_size,
            patch_size=16,
            embed_dim=1024,
            depth=24,
            num_heads=16,
            mlp_ratio=4 * 2 / 3,
            window_size=32,
            window_block_indexes=_window_indexes(24),
            pretrain_img_size=336,
            pt_hw_seq_len=16,
            subln=True,
            inner_attn_ln=True,
            swiglu_subln=True,
            drop_path_rate=drop_path_rate,
            dtype=dtype,
        ),
        out_channels=256,
        dtype=dtype,
    )


def build_transformer(
    num_layers=6,
    num_queries=900,
    vl_fusion=False,
    embed_dim_language=1024,
    window_radius=4,
    use_act_checkpoint=False,
    proposal_ambiguous=0,
    dtype=jnp.float32,
):
    return DeformableDetrTransformer(
        encoder=DeformableTransformerEncoder(
            embed_dim=256,
            num_heads=8,
            feedforward_dim=2048,
            num_layers=num_layers,
            num_feature_levels=5,
            window_radius=window_radius,
            vl_fusion=vl_fusion,
            vl_embed_dim=2048,
            vl_num_heads=8,
            vl_init_values=1.0 / 6,
            embed_dim_language=embed_dim_language,
            use_act_checkpoint=use_act_checkpoint,
            dtype=dtype,
        ),
        decoder=DeformableTransformerDecoder(
            embed_dim=256,
            num_heads=8,
            feedforward_dim=2048,
            num_layers=num_layers,
            num_feature_levels=5,
            look_forward_twice=False,  # reference default; no config ever enables it
            use_act_checkpoint=use_act_checkpoint,
            proposal_ambiguous=proposal_ambiguous,
            dtype=dtype,
        ),
        num_feature_levels=5,
        two_stage_num_proposals=num_queries,
        assign_first_stage=True,
        dtype=dtype,
    )


def build_ape_ti(
    img_size=1024,
    num_queries=900,
    embed_dim_language=1024,
    mask_on=True,
    window_radius=4,
    num_learned_classes=0,
    use_act_checkpoint=False,
    proposal_ambiguous=0,
    scale_factors=(4.0, 2.0, 1.0, 0.5),
    dtype=jnp.float32,
):
    """APE-Ti: EVA-02-Ti backbone, no VL fusion (BASELINE.json config #1/#2).

    num_learned_classes > 0 selects the closed-vocabulary legacy-deta head
    (learned class-embedding bank instead of encoded text).
    use_act_checkpoint remats encoder/decoder layers (training at 1024^2
    OOMs HBM without it: saved FFN activations are ~680 MB/layer).
    scale_factors: SimpleFeaturePyramid scales; the reference's latency
    protocol (scripts/eval_time.sh:36,76) reduces them to (2.0, 1.0, 0.5)
    and lets the neck extend to 5 levels with stride-2 extra convs."""
    # feature names: SFP emits p{log2(16/scale)} per scale + top-block "p6"
    # (p5-pool when 0.5 is the last scale); the neck extends to 5 levels with
    # stride-2 extra convs named extra{i} (detrex ChannelMapper semantics)
    import math as _math

    feats = [f"p{int(_math.log2(16 / s))}" for s in scale_factors] + ["p6"]
    feats = sorted(set(feats), key=lambda n: int(n[1:]))
    feats += [f"extra{i}" for i in range(5 - len(feats))]
    return APEDeta(
        backbone=build_backbone_ti(img_size, dtype, scale_factors=scale_factors),
        neck=ChannelMapper(out_channels=256, num_outs=5, dtype=dtype),
        in_features=tuple(feats),
        mask_in_feature=feats[0],
        transformer=build_transformer(
            num_queries=num_queries,
            vl_fusion=False,
            embed_dim_language=embed_dim_language,
            window_radius=window_radius,
            use_act_checkpoint=use_act_checkpoint,
            proposal_ambiguous=proposal_ambiguous,
            dtype=dtype,
        ),
        embed_dim=256,
        embed_dim_language=embed_dim_language,
        num_queries=num_queries,
        mask_on=mask_on,
        num_learned_classes=num_learned_classes,
        dtype=dtype,
    )


def build_ape_l_d(
    img_size=1024,
    num_queries=900,
    embed_dim_language=1024,
    mask_on=True,
    window_radius=4,
    use_act_checkpoint=True,
    drop_path_rate=0.4,
    proposal_ambiguous=0,
    scale_factors=(4.0, 2.0, 1.0, 0.5),
    dtype=jnp.float32,
):
    """APE-L_D: ViT-L EVA-02-CLIP backbone + vision-language fusion (flagship).

    scale_factors mirrors build_ape_ti: the reference's latency protocol
    (scripts/eval_time.sh:36,76) reduces the pyramid to (2.0, 1.0, 0.5) with
    the neck extending to 5 levels via stride-2 extra convs."""
    import math as _math

    feats = [f"p{int(_math.log2(16 / s))}" for s in scale_factors] + ["p6"]
    feats = sorted(set(feats), key=lambda n: int(n[1:]))
    feats += [f"extra{i}" for i in range(5 - len(feats))]
    return APEDeta(
        backbone=build_backbone_l(
            img_size, dtype, drop_path_rate, scale_factors=scale_factors
        ),
        neck=ChannelMapper(out_channels=256, num_outs=5, dtype=dtype),
        in_features=tuple(feats),
        mask_in_feature=feats[0],
        transformer=build_transformer(
            num_queries=num_queries,
            vl_fusion=True,
            embed_dim_language=embed_dim_language,
            window_radius=window_radius,
            use_act_checkpoint=use_act_checkpoint,
            proposal_ambiguous=proposal_ambiguous,
            dtype=dtype,
        ),
        embed_dim=256,
        embed_dim_language=embed_dim_language,
        num_queries=num_queries,
        mask_on=mask_on,
        dtype=dtype,
    )


def build_backbone_g(img_size=1024, dtype=jnp.float32, drop_path_rate=0.0):
    """EVA-01 ViT-g (reference configs/common/backbone/vitg_eva01.py:9-40):
    1408d/40L/16H, plain GELU MLP (ratio 6144/1408), decomposed rel-pos, no
    RoPE, windows of 16 with every 4th block global."""
    depth = 40
    win = tuple(i for i in range(depth) if (i + 1) % 4 != 0)
    return SimpleFeaturePyramid(
        net=EVAViT(
            img_size=img_size,
            patch_size=16,
            embed_dim=1408,
            depth=depth,
            num_heads=16,
            mlp_ratio=6144 / 1408,
            window_size=16,
            window_block_indexes=win,
            pretrain_img_size=224,
            rope=False,
            mlp_type="gelu",
            use_rel_pos=True,
            drop_path_rate=drop_path_rate,
            dtype=dtype,
        ),
        out_channels=256,
        dtype=dtype,
    )
