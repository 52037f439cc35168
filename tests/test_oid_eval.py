"""OID hierarchical AP: hand-computed scenarios (VERDICT round-1 item 7)."""

import numpy as np

from ape_tpu.evaluation.oid_eval import OIDEvaluator, build_ancestors, voc_average_precision


def _img(image_id, anns, neg=(), pos=()):
    return {
        "image_id": image_id,
        "annotations": anns,
        "neg_category_ids": list(neg),
        "pos_category_ids": list(pos),
    }


def _ann(cat, box, crowd=0):
    return {"category_id": cat, "bbox": list(map(float, box)), "iscrowd": crowd}


def _pred(image_id, boxes, scores, classes):
    return {
        "image_id": image_id,
        "instances": {
            "boxes": np.asarray(boxes, np.float64),
            "scores": np.asarray(scores, np.float64),
            "classes": np.asarray(classes, np.int64),
        },
    }


def test_perfect_single_det():
    ev = OIDEvaluator([_img(0, [_ann(1, [0, 0, 10, 10])])])
    ev.process([_pred(0, [[0, 0, 10, 10]], [0.9], [1])])
    r = ev.evaluate()
    assert r["bbox/AP"] == 100.0 and r["bbox/AP50"] == 100.0


def test_voc_area_hand_computed():
    """2 GTs; dets TP(.9), FP(.8), TP(.7) -> AP = 0.5*1 + 0.5*(2/3) = 83.33."""
    ev = OIDEvaluator(
        [_img(0, [_ann(1, [0, 0, 10, 10]), _ann(1, [100, 100, 110, 110])])]
    )
    ev.process(
        [
            _pred(
                0,
                [[0, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110]],
                [0.9, 0.8, 0.7],
                [1, 1, 1],
            )
        ]
    )
    r = ev.evaluate()
    np.testing.assert_allclose(r["bbox/AP"], 100 * (0.5 + 0.5 * 2 / 3), atol=1e-6)


def test_hierarchy_expansion():
    """GT expanded to {animal=1, dog=2}; det labeled dog only.

    With expand_pred_label the dog det also scores the animal class -> mAP 100;
    without, animal has GT but no det -> its AP = 0 -> mAP 50.
    """
    hierarchy = {
        "LabelName": "animal",
        "Subcategory": [{"LabelName": "dog"}],
    }
    anc = build_ancestors(hierarchy, {"animal": 1, "dog": 2})
    assert anc == {2: {1}}
    dicts = [_img(0, [_ann(1, [0, 0, 10, 10]), _ann(2, [0, 0, 10, 10])])]
    preds = [_pred(0, [[0, 0, 10, 10]], [0.9], [2])]

    ev = OIDEvaluator(dicts, ancestors=anc, expand_pred_label=True)
    ev.process(preds)
    assert ev.evaluate()["bbox/AP"] == 100.0

    ev = OIDEvaluator(dicts, ancestors=anc, expand_pred_label=False)
    ev.process(preds)
    assert ev.evaluate()["bbox/AP"] == 50.0


def test_federated_filtering():
    """A det for a class outside pos+neg of its image is dropped, not an FP."""
    dicts = [
        _img(0, [_ann(1, [0, 0, 10, 10])]),  # class 2 unverified here
        _img(1, [_ann(2, [0, 0, 10, 10])]),
    ]
    preds = [
        _pred(0, [[0, 0, 10, 10], [0, 0, 10, 10]], [0.95, 0.9], [1, 2]),
        _pred(1, [[0, 0, 10, 10]], [0.8], [2]),
    ]
    ev = OIDEvaluator(dicts)
    ev.process(preds)
    # class 2's spurious det on image 0 was dropped -> both classes AP 100
    assert ev.evaluate()["bbox/AP"] == 100.0

    # same, but image 0 verifies class 2 as negative -> det kept as FP@0.9
    dicts2 = [
        _img(0, [_ann(1, [0, 0, 10, 10])], neg=[2]),
        _img(1, [_ann(2, [0, 0, 10, 10])]),
    ]
    ev = OIDEvaluator(dicts2)
    ev.process(preds)
    r = ev.evaluate()
    # class 2: FP(.9) then TP(.8): pr=[0,.5], rc=[0,1] -> AP=.5; class1 AP=1
    np.testing.assert_allclose(r["bbox/AP"], 100 * (1.0 + 0.5) / 2, atol=1e-6)


def test_group_of():
    """3 dets inside one group-of box: one TP at max score, no FPs; an outside
    det is a normal FP. num_gt counts the group box once."""
    dicts = [_img(0, [_ann(1, [0, 0, 100, 100], crowd=1)])]
    preds = [
        _pred(
            0,
            [[0, 0, 10, 10], [20, 20, 40, 40], [50, 50, 90, 90], [200, 200, 210, 210]],
            [0.9, 0.8, 0.7, 0.6],
            [1, 1, 1, 1],
        )
    ]
    ev = OIDEvaluator(dicts)
    ev.process(preds)
    r = ev.evaluate()
    # entries: group TP@0.9, FP@0.6 -> pr [1, .5], rc [1, 1] -> AP = 1.0
    np.testing.assert_allclose(r["bbox/AP"], 100.0, atol=1e-6)


def test_voc_ap_helper():
    pr = np.asarray([1.0, 1.0, 2.0 / 3.0])
    rc = np.asarray([0.5, 0.5, 1.0])
    np.testing.assert_allclose(voc_average_precision(pr, rc), 0.5 + 0.5 * 2 / 3)


def test_freq_buckets():
    dicts = [_img(i, [_ann(1, [0, 0, 10, 10])]) for i in range(12)]
    dicts.append(_img(100, [_ann(2, [0, 0, 10, 10])]))
    ev = OIDEvaluator(dicts)
    ev.process([_pred(i, [[0, 0, 10, 10]], [0.9], [1]) for i in range(12)])
    ev.process([_pred(100, [[0, 0, 10, 10]], [0.9], [2])])
    r = ev.evaluate()
    assert r["bbox/APc"] == 100.0  # class 1: 12 images -> common
    assert r["bbox/APr"] == 100.0  # class 2: 1 image -> rare
    assert np.isnan(r["bbox/APf"])
