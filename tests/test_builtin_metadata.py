"""Builtin registration metadata depth (VERDICT round-1 item 6)."""

import numpy as np

from ape_tpu.data.catalog import MetadataCatalog, get_text_list
from ape_tpu.data.datasets import metadata as M
from ape_tpu.data.datasets.builtin import register_metadata


def test_objects365_categories():
    cats = M.objects365_categories(fixname=True)
    assert len(cats) == 365
    assert all("name" in c and "id" in c for c in cats)


def test_oid_categories_and_counts():
    v6 = M.oid_categories("v6")
    assert len(v6) == 601
    counts = M.category_image_counts("openimages")
    assert len(counts) == 601
    w = M.fed_loss_cls_weights("openimages")
    assert len(w) == 601 and all(x >= 0 for x in w)


def test_lvis_counts():
    counts = M.category_image_counts("lvis")
    assert len(counts) == 1203
    w = M.fed_loss_cls_weights("lvis_v1_train")
    ids = sorted(counts)
    np.testing.assert_allclose(w[0], counts[ids[0]] ** 0.5)


def test_odinw_suite_depth():
    cats = M.odinw_categories()
    assert len(cats) == 34  # 35 suite datasets share 34 category tables
    splits = M.odinw_splits()
    test_keys = [k for per in splits.values() for k in per if k.endswith(("_test", "_val"))]
    assert len(test_keys) >= 35
    # prompt rewording applied (reference odinw_prompts.py)
    classes = M.thing_classes_with_prompts("AerialMaritimeDrone")
    assert "a ship" in classes and "boat" not in classes


def test_seginw_suite():
    assert len(M.seginw_categories()) >= 25
    assert len([k for k in M.seginw_splits() if k.endswith("_val")]) == 25


def test_register_metadata_populates_catalog():
    register_metadata()
    m = MetadataCatalog.get("objects365_val_fixname")
    assert len(m.get("thing_classes", [])) == 365
    assert m.get("evaluator_type") == "coco"
    oid = MetadataCatalog.get("openimages_v6_val_bbox")
    assert oid.get("evaluator_type") == "oid"
    assert len(get_text_list(oid)) == 601
    ref = MetadataCatalog.get("refcoco-unc-val")
    assert ref.get("evaluator_type") == "refcoco"
