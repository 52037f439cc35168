"""D-cube FULL/PRES/ABS + Unified label-space map-back evaluators."""

import numpy as np

from ape_tpu.evaluation.coco_eval import COCOEvaluator
from ape_tpu.evaluation.d3_eval import D3Evaluator
from ape_tpu.evaluation.unified_eval import (
    UnifiedEvaluator,
    build_map_back,
    build_map_back_novel,
)


def _img(image_id, anns):
    return {"image_id": image_id, "annotations": anns}


def _ann(cat, box):
    return {"category_id": cat, "bbox": list(map(float, box)), "area": 100.0}


def _pred(image_id, boxes, scores, classes, **extra):
    return {
        "image_id": image_id,
        "instances": {
            "boxes": np.asarray(boxes, np.float64),
            "scores": np.asarray(scores, np.float64),
            "classes": np.asarray(classes, np.int64),
        },
        **extra,
    }


def test_d3_modes():
    """Description 1 is a presence sentence (present), 2 an absence one.

    Det hits cat 1 and (wrongly) cat 2 somewhere else. FULL sees both;
    PRES only cat 1 (perfect); ABS only cat 2 (all FP -> AP 0).
    """
    dicts = [_img(0, [_ann(1, [0, 0, 10, 10])])]
    ev = D3Evaluator(dicts, pres_ids=[1], abs_ids=[2], group="inter")
    ev.process(
        [_pred(0, [[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.8], [1, 2])]
    )
    r = ev.evaluate()
    assert r["bbox/AP_PRES"] == 100.0
    # ABS view: cat-2 GT empty everywhere -> no GT -> AP is nan there
    assert np.isnan(r["bbox/AP_ABS"]) or r["bbox/AP_ABS"] == 0.0
    assert r["bbox/AP_FULL"] == 100.0  # cat 2 has no GT, excluded from mean


def test_d3_intra_sent_id_remap():
    """intra group: prediction classes are local sentence indices remapped
    through the example's sent_ids; out-of-range ones dropped."""
    dicts = [_img(0, [_ann(7, [0, 0, 10, 10])])]
    ev = D3Evaluator(dicts, group="intra")
    ev.process(
        [
            _pred(
                0,
                [[0, 0, 10, 10], [1, 1, 9, 9]],
                [0.9, 0.8],
                [0, 5],  # local idx 0 -> sent_id 7; idx 5 out of range -> drop
                sent_ids=[7, 9],
            )
        ]
    )
    r = ev.evaluate()
    assert r["bbox/AP_FULL"] == 100.0


def test_unified_map_back():
    """Unified ids [10, 20] are this dataset's classes [0, 1]; unified id 99
    is outside the label space and must be dropped, not counted as FP."""
    dicts = [_img(0, [_ann(0, [0, 0, 10, 10]), _ann(1, [20, 20, 30, 30])])]
    base = COCOEvaluator(dicts, "bbox", 100)
    ev = UnifiedEvaluator(base, build_map_back([10, 20]))
    ev.process(
        [
            _pred(
                0,
                [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]],
                [0.9, 0.8, 0.95],
                [10, 20, 99],
            )
        ]
    )
    r = ev.evaluate()
    assert r["bbox/AP"] == 100.0


def test_unified_novel_fanout():
    """One unified id matching two native classes duplicates the detection."""
    mb = build_map_back_novel([[5], [5, 6]])
    assert mb == {5: [0, 1], 6: [1]}
    dicts = [_img(0, [_ann(0, [0, 0, 10, 10]), _ann(1, [0, 0, 10, 10])])]
    base = COCOEvaluator(dicts, "bbox", 100)
    ev = UnifiedEvaluator(base, mb)
    ev.process([_pred(0, [[0, 0, 10, 10]], [0.9], [5])])
    r = ev.evaluate()
    assert r["bbox/AP"] == 100.0
