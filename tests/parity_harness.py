"""Builders for the full-model end-to-end parity harness.

Reference side: the real /root/reference task-model stack
(DeformableDETRSegmVL + DeformableDetrTransformerVL + vit_eva02 SFP backbone)
instantiated at tiny dims on CPU with pytorch_attn=True — the reference's own
numeric fallback (multi_scale_deform_attn.py:320-348), i.e. the closest thing
to ground truth this environment can run.

Our side: APEDeta at matching dims, parameters converted from the reference
state dict through checkpoint/convert.py (the production converter).
"""

import numpy as np

# tiny-but-structurally-complete dims: 5 pyramid levels, two-stage select with
# NMS, 2 encoder + 2 decoder layers, 60 queries (12 per level)
DIMS = dict(
    img=256,
    vit_embed=64,
    vit_depth=2,
    vit_heads=2,
    win=2,
    embed=64,
    heads=4,
    ffn=128,
    layers=2,
    queries=60,
    ldim=32,
    num_text=7,
)


class _RecordingMixin:
    """Capture the raw per-layer head outputs that the reference forward only
    exposes through _set_aux_loss, plus the NMS-selected instances."""

    def _set_aux_loss(self, outputs_class, outputs_coord, outputs_mask):
        self._rec_stacks = dict(
            logits=[t.detach().numpy() for t in outputs_class],
            boxes=[t.detach().numpy() for t in outputs_coord],
            masks=[t.detach().numpy() for t in outputs_mask],
        )
        return super()._set_aux_loss(outputs_class, outputs_coord, outputs_mask)


class FakeLanguage:
    """Stands in for EVA02CLIP.forward_text: returns fixed features so both
    sides see identical text embeddings."""

    def __init__(self, feats):
        import torch

        self.feats = torch.as_tensor(np.asarray(feats, np.float32))

    def forward_text(self, text_list, cache=False):
        assert len(text_list) <= self.feats.shape[0], (
            len(text_list), self.feats.shape)
        return {"last_hidden_state_eot": self.feats[: len(text_list)]}


def build_ref_model(
    d=DIMS, vl_fusion=False, seed=0, offset_scale=1.0, proposal_ambiguous=0
):
    """Instantiate the reference flagship model at tiny dims (eval mode).

    offset_scale: multiply the (directionally initialized) MSDA sampling-offset
    biases to emulate realistic learned offset magnitudes.
    proposal_ambiguous: duplicated enc-stage heads whose per-proposal argmax
    wins the first stage (the reference flagship configs set 1); the copies
    are perturbed after init so the argmax actually varies (deepcopy leaves
    them identical to the base head)."""
    import torch
    import torch.nn as nn

    from tests.ref_stubs import load_reference_module
    from tests.ref_stubs_detrex import install_detrex_stubs, load_reference_ape

    install_detrex_stubs()
    mods = load_reference_ape()
    vit = load_reference_module("vit_eva02.py", "vit_eva02")
    import torch.nn.functional as F
    from detectron2.data.catalog import MetadataCatalog
    from detectron2.layers import ShapeSpec
    from detrex.layers import PositionEmbeddingSine
    from detrex.modeling.neck import ChannelMapper

    torch.manual_seed(seed)

    class LastLevelMaxPool(nn.Module):
        num_levels = 1
        in_feature = "p5"

        def forward(self, x):
            return [F.max_pool2d(x, kernel_size=1, stride=2, padding=0)]

    net = vit.ViT(
        img_size=d["img"], patch_size=16, embed_dim=d["vit_embed"],
        depth=d["vit_depth"], num_heads=d["vit_heads"], mlp_ratio=4 * 2 / 3,
        drop_path_rate=0.0, window_size=d["win"],
        window_block_indexes=(0,), use_act_checkpoint=False,
        pretrain_img_size=d["img"], pt_hw_seq_len=d["img"] // 16, rope=True,
        swiglu=True, xattn=False, out_feature="last_feat",
    )
    backbone = vit.SimpleFeaturePyramid(
        net=net, in_feature="last_feat", out_channels=d["embed"],
        scale_factors=(4.0, 2.0, 1.0, 0.5), top_block=LastLevelMaxPool(),
        norm="LN", square_pad=d["img"],
    )
    shapes = {f"p{i}": ShapeSpec(channels=d["embed"]) for i in range(2, 7)}
    neck = ChannelMapper(
        input_shapes=shapes, in_features=["p2", "p3", "p4", "p5", "p6"],
        out_channels=d["embed"], num_outs=5, kernel_size=1,
        norm_layer=nn.GroupNorm(num_groups=32, num_channels=d["embed"]),
    )
    pos_embed = PositionEmbeddingSine(
        num_pos_feats=d["embed"] // 2, temperature=10000, normalize=True,
        offset=-0.5,
    )

    vl_layer = None
    if vl_fusion:
        from ape.layers.vision_language_fusion import VisionLanguageFusion

        vl_layer = VisionLanguageFusion(
            v_dim=d["embed"], l_dim=d["ldim"], embed_dim=2 * d["embed"],
            num_heads=4, dropout=0.0, drop_path=0.0, init_values=1.0 / 6,
            stable_softmax_2d=True, clamp_min_for_underflow=True,
            clamp_max_for_overflow=True, use_checkpoint=False,
        )

    tvl = mods["deformable_transformer_vl"]
    transformer = tvl.DeformableDetrTransformerVL(
        encoder=tvl.DeformableDetrTransformerEncoderVL(
            embed_dim=d["embed"], num_heads=d["heads"], feedforward_dim=d["ffn"],
            attn_dropout=0.0, ffn_dropout=0.0, num_layers=d["layers"],
            post_norm=False, num_feature_levels=5, vl_layer=vl_layer,
            use_act_checkpoint=False, pytorch_attn=True,
        ),
        decoder=tvl.DeformableDetrTransformerDecoderVL(
            embed_dim=d["embed"], num_heads=d["heads"], feedforward_dim=d["ffn"],
            attn_dropout=0.0, ffn_dropout=0.0, num_layers=d["layers"],
            return_intermediate=True, num_feature_levels=5,
            use_act_checkpoint=False, look_forward_twice=False,
            pytorch_attn=True,
        ),
        num_feature_levels=5, as_two_stage=True,
        two_stage_num_proposals=d["queries"], assign_first_stage=True,
        proposal_ambiguous=proposal_ambiguous,
    )
    # the reference hardcodes num_pos_feats=128 (4*128 == 2*256 only at
    # embed_dim 256); rescale for tiny dims
    import functools

    transformer.get_proposal_pos_embed = functools.partial(
        type(transformer).get_proposal_pos_embed.__func__
        if hasattr(type(transformer).get_proposal_pos_embed, "__func__")
        else type(transformer).get_proposal_pos_embed,
        transformer,
        num_pos_feats=d["embed"] // 2,
    )

    class DummyCriterion(nn.Module):
        loss_class_type = "focal_loss"

        def __init__(self, num_classes):
            super().__init__()
            self.num_classes = num_classes
            self.weight_dict = {}

    meta = MetadataCatalog.get("parity_tiny")
    meta.thing_classes = [f"thing {i}" for i in range(d["num_text"])]

    segm_vl = mods["deformable_detr_segm_vl"]

    class RecordingModel(_RecordingMixin, segm_vl.DeformableDETRSegmVL):
        pass

    model = RecordingModel(
        instance_on=True, semantic_on=False, panoptic_on=False,
        input_shapes=shapes, mask_in_features=["p2"], mask_encode_level=0,
        name_prompt_fusion_type="zero",
        name_prompt_fusion_text=[True] if vl_fusion else None,
        test_mask_on=True, aux_mask=False,
        backbone=backbone, position_embedding=pos_embed, neck=neck,
        transformer=transformer, embed_dim=d["embed"],
        num_classes=d["num_text"], num_queries=d["queries"],
        criterion=[DummyCriterion(d["num_text"])],
        pixel_mean=[123.675, 116.280, 103.530],
        pixel_std=[58.395, 57.120, 57.375],
        aux_loss=True, with_box_refine=True, as_two_stage=True,
        select_box_nums_for_evaluation=20,
        dataset_names=["parity_tiny"], dataset_metas=["parity_tiny"],
        dataset_prompts=["name"], embed_dim_language=d["ldim"],
        text_feature_bank=False, text_feature_reduce_before_fusion=True,
        text_feature_batch_repeat=True,
    )
    model.eval()

    if offset_scale != 1.0:
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "sampling_offsets.bias" in name:
                    p.mul_(offset_scale)

    if proposal_ambiguous:
        # deepcopies start identical to the base head -> argmax would tie
        # everywhere; perturb so head selection genuinely varies per proposal
        gen = torch.Generator().manual_seed(seed + 7)
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "_ambiguous" in name:
                    p.add_(0.02 * torch.randn(p.shape, generator=gen))

    rng = np.random.RandomState(seed + 1)
    text_feats = rng.randn(d["num_text"], d["ldim"]).astype(np.float32)
    model.model_language = FakeLanguage(text_feats)
    model.eval_dataset_id = 0
    model.eval_dataset_entity = "thing"
    return model, text_feats


def build_our_model(d=DIMS, vl_fusion=False, window_radius=16, proposal_ambiguous=0):
    import jax.numpy as jnp

    from ape_tpu.modeling.ape_deta.model import APEDeta, ChannelMapper
    from ape_tpu.modeling.ape_deta.transformer import (
        DeformableDetrTransformer,
        DeformableTransformerDecoder,
        DeformableTransformerEncoder,
    )
    from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

    backbone = SimpleFeaturePyramid(
        net=EVAViT(
            img_size=d["img"], patch_size=16, embed_dim=d["vit_embed"],
            depth=d["vit_depth"], num_heads=d["vit_heads"], mlp_ratio=4 * 2 / 3,
            window_size=d["win"], window_block_indexes=(0,),
            pretrain_img_size=d["img"], pt_hw_seq_len=d["img"] // 16,
            packed_swiglu=True,
        ),
        out_channels=d["embed"],
    )
    transformer = DeformableDetrTransformer(
        encoder=DeformableTransformerEncoder(
            embed_dim=d["embed"], num_heads=d["heads"],
            feedforward_dim=d["ffn"], num_layers=d["layers"],
            num_feature_levels=5, window_radius=window_radius, vl_fusion=vl_fusion,
            vl_embed_dim=2 * d["embed"], vl_num_heads=4,
            vl_init_values=1.0 / 6, embed_dim_language=d["ldim"],
        ),
        decoder=DeformableTransformerDecoder(
            embed_dim=d["embed"], num_heads=d["heads"],
            feedforward_dim=d["ffn"], num_layers=d["layers"],
            num_feature_levels=5, look_forward_twice=False,
            proposal_ambiguous=proposal_ambiguous,
        ),
        num_feature_levels=5, two_stage_num_proposals=d["queries"],
        assign_first_stage=True,
    )
    return APEDeta(
        backbone=backbone,
        neck=ChannelMapper(out_channels=d["embed"]),
        transformer=transformer,
        embed_dim=d["embed"], embed_dim_language=d["ldim"],
        num_queries=d["queries"],
    )


def make_image(d=DIMS, seed=3, h=None, w=None):
    """Raw uint8-style image (C, H, W) float tensor for the reference, and the
    normalized NHWC copy + sizes for our model."""
    rng = np.random.RandomState(seed)
    h = h or d["img"]
    w = w or d["img"]
    img = rng.randint(0, 256, (3, h, w)).astype(np.float32)
    mean = np.asarray([123.675, 116.280, 103.530], np.float32)[:, None, None]
    std = np.asarray([58.395, 57.120, 57.375], np.float32)[:, None, None]
    norm = (img - mean) / std
    padded = np.zeros((3, d["img"], d["img"]), np.float32)
    padded[:, :h, :w] = norm
    ours_img = np.transpose(padded, (1, 2, 0))[None]  # (1, H, W, 3) NHWC
    sizes = np.asarray([[h, w]], np.int32)
    return img, ours_img, sizes


def convert_ref_to_ours(ref_model, template_params):
    """Push the reference state dict through the production converter and
    shape-check against our init template."""
    from ape_tpu.checkpoint.convert import (
        convert_torch_state_dict,
        flatten_tree,
        unflatten_tree,
    )

    sd = {
        k: v.detach().numpy()
        for k, v in ref_model.state_dict().items()
        if "rope" not in k and "freqs" not in k and "pixel_" not in k
    }
    flat = convert_torch_state_dict(sd)
    tflat = flatten_tree(template_params)
    missing = sorted(k for k in tflat if k not in flat)
    assert not missing, f"unconverted params: {missing[:20]} (+{len(missing)} total)"
    bad = [
        (k, np.asarray(flat[k]).shape, np.asarray(tflat[k]).shape)
        for k in tflat
        if tuple(np.asarray(flat[k]).shape) != tuple(np.asarray(tflat[k]).shape)
    ]
    assert not bad, f"shape mismatches: {bad[:10]}"
    return unflatten_tree({k: v for k, v in flat.items() if k in tflat})
