"""Integration: registered COCO-format dataset -> APE wrapper -> COCO AP numbers."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from ape_tpu.data.datasets.coco import register_coco_instances
from ape_tpu.data.mapper import DatasetMapperDETR
from ape_tpu.evaluation.eval_runner import evaluate_dataset, paste_masks
from tests.test_data import make_coco_json
from tests.test_inference import FakeLanguage


def test_paste_masks():
    logits = np.full((1, 8, 8), 10.0, np.float32)
    masks = paste_masks(logits, np.asarray([[4.0, 4.0, 20.0, 16.0]]), 32, 32)
    m = masks[0]
    assert m[10, 10] and not m[0, 0] and not m[20, 25]


def test_evaluate_dataset_runs(tmp_path, rng):
    jp, root = make_coco_json(tmp_path, n_images=2)
    name = "tiny_eval_ds"
    if name not in DatasetCatalog:
        register_coco_instances(name, {}, jp, root)

    # tiny model + wrapper (reuse the builder from test_inference via imports)
    from tests.test_inference import test_ape_wrapper_end_to_end  # noqa: F401
    from ape_tpu.engine.ape_wrapper import APE
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
    ape = APE(model, params, FakeLanguage(), dataset_names=[name], max_text=4,
              select_box_nums_for_evaluation=8, test_score_thresh=0.0)

    mapper = DatasetMapperDETR(is_train=False, image_size=64)
    results = evaluate_dataset(ape, name, mapper, iou_types=("bbox", "segm"))
    assert "bbox/AP" in results and "segm/AP" in results
    assert np.isfinite(results["bbox/AP"]) or np.isnan(results["bbox/AP"])


def test_profile_stage_times(tmp_path, rng):
    """Model-internal stage attribution (reference evaluator.py:92-160)."""
    from tests.test_panoptic_e2e import _tiny_ape
    from ape_tpu.engine.ape_wrapper import APE

    model, params, FakeLanguage = _tiny_ape()
    ape = APE(model, params, FakeLanguage(), dataset_names=[], max_text=4)
    inp = {
        "image": rng.randn(64, 64, 3).astype(np.float32),
        "image_size": np.asarray([64, 64], np.int32),
    }
    t = ape.profile_stage_times(inp, iters=1)
    assert set(t) >= {"backbone_time", "transformer_time", "postprocess_time"}
    assert all(v >= 0 for v in t.values())
