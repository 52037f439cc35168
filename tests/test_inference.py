"""End-to-end inference path: APE wrapper + DefaultPredictor + postprocess."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from ape_tpu.engine.ape_wrapper import APE
from ape_tpu.engine.defaults import DefaultPredictor
from ape_tpu.modeling.ape_deta.postprocess import (
    instance_inference,
    semantic_inference,
)


class FakeLanguage:
    """Deterministic stand-in for the CLIP tower (hash features)."""

    def forward_text(self, text_list, cache=False):
        feats = np.stack(
            [
                np.random.RandomState(abs(hash(t)) % 2**31).randn(32).astype(np.float32)
                for t in text_list
            ]
        )
        return {"last_hidden_state_eot": feats}



def test_instance_inference_fixed_shape(rng):
    k, t = 32, 6
    logits = jnp.asarray(rng.randn(k, t).astype(np.float32) * 2)
    boxes = jnp.asarray(rng.rand(k, 4).astype(np.float32) * 0.4 + 0.2)
    out = instance_inference(
        logits, boxes, jnp.asarray([64, 48]), jnp.ones(t, bool),
        score_thresh=0.05, nms_thresh=0.5, topk=10, pre_nms=64,
    )
    assert out["boxes"].shape == (10, 4)
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 48 + 1e-3).all()
    assert (b[:, 3] <= 64 + 1e-3).all()
    s = np.asarray(out["scores"])
    assert (np.diff(s) <= 1e-6).all()  # sorted desc


def test_instance_inference_masks_classes(rng):
    k, t = 16, 3
    logits = np.full((k, t), -10.0, np.float32)
    logits[3, 1] = 5.0  # one strong detection: query 3, class 1
    out = instance_inference(
        jnp.asarray(logits), jnp.asarray(rng.rand(k, 4).astype(np.float32) * 0.3 + 0.3),
        jnp.asarray([32, 32]), jnp.ones(t, bool), topk=5, pre_nms=16,
    )
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1
    assert int(np.asarray(out["classes"])[valid][0]) == 1
    assert int(np.asarray(out["query_idx"])[valid][0]) == 3


def test_semantic_inference_shapes(rng):
    sem = semantic_inference(
        jnp.asarray(rng.randn(8, 4).astype(np.float32)),
        jnp.asarray(rng.randn(8, 16, 16).astype(np.float32)),
        jnp.ones(4, bool),
    )
    assert sem.shape == (4, 16, 16)
    s = np.asarray(sem)
    assert (s >= 0).all() and np.isfinite(s).all()


def test_ape_wrapper_end_to_end(rng):
    """Full predictor path on random weights: image -> boxes/scores/classes/sem_seg."""
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
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64, 64]], jnp.int32),
        jnp.zeros((1, 4, 32)),
        jnp.ones((1, 4), bool),
    )["params"]

    meta = MetadataCatalog.get("tiny_test_ds")
    meta.set(thing_classes=["cat", "dog"], stuff_classes=["sky"])
    ape = APE(
        model, params, FakeLanguage(),
        dataset_names=["tiny_test_ds"],
        max_text=4,
        select_box_nums_for_evaluation=8,
        test_score_thresh=0.0,
    )
    ape.set_eval_dataset("tiny_test_ds")
    predictor = DefaultPredictor(ape, image_size=64)
    image = (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    pred = predictor(image)
    assert pred["text_list"] == ["cat", "dog", "sky"]
    inst = pred["instances"]
    assert inst["boxes"].shape[1] == 4
    assert len(inst["scores"]) == len(inst["classes"])
    assert "sem_seg" in pred
    # prompted path
    pred2 = predictor(image, text_prompt="person,frisbee")
    assert pred2["text_list"] == ["person", "frisbee"]
