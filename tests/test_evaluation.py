"""Evaluator correctness on hand-constructed cases."""

import numpy as np
import pytest

from ape_tpu.evaluation.coco_eval import COCOEvaluator, box_iou_xyxy
from ape_tpu.evaluation.other_evals import (
    PanopticEvaluator,
    RefCOCOEvaluator,
    SemSegEvaluator,
    aggregate_benchmark_suite,
)
from ape_tpu.data.transforms import rle_decode, rle_encode


def make_gt(image_id, boxes, cats):
    return {
        "image_id": image_id,
        "annotations": [
            {"bbox": list(map(float, b)), "category_id": c, "area": (b[2] - b[0]) * (b[3] - b[1])}
            for b, c in zip(boxes, cats)
        ],
    }


def test_coco_eval_perfect_predictions():
    gts = [make_gt(1, [[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1])]
    ev = COCOEvaluator(gts, "bbox")
    ev.process(
        [
            {
                "image_id": 1,
                "instances": {
                    "boxes": np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]]),
                    "scores": np.asarray([0.9, 0.8]),
                    "classes": np.asarray([0, 1]),
                },
            }
        ]
    )
    res = ev.evaluate()
    assert abs(res["bbox/AP"] - 100.0) < 1e-6
    assert abs(res["bbox/AP50"] - 100.0) < 1e-6


def test_coco_eval_false_positive_and_miss():
    gts = [make_gt(1, [[10, 10, 50, 50], [60, 60, 90, 90]], [0, 0])]
    ev = COCOEvaluator(gts, "bbox")
    # one perfect hit, one far-off FP with LOWER score, one gt missed
    ev.process(
        [
            {
                "image_id": 1,
                "instances": {
                    "boxes": np.asarray([[10, 10, 50, 50], [200, 200, 240, 240]]),
                    "scores": np.asarray([0.9, 0.5]),
                    "classes": np.asarray([0, 0]),
                },
            }
        ]
    )
    res = ev.evaluate()
    # precision envelope: recall 0.5 at precision 1.0 -> AP ~ 50 (+1 interp pt)
    assert 45 < res["bbox/AP"] < 56, res


def test_coco_eval_localization_threshold():
    """A det with IoU ~0.6 counts at thr<=0.55 only -> AP = mean over thrs."""
    gts = [make_gt(1, [[0, 0, 100, 100]], [0])]
    ev = COCOEvaluator(gts, "bbox")
    # shifted box: IoU = (100-20)^2/ (2*100^2 - 80^2) = 6400/13600 = 0.47
    ev.process(
        [
            {
                "image_id": 1,
                "instances": {
                    "boxes": np.asarray([[0, 0, 80, 80]]),
                    "scores": np.asarray([0.9]),
                    "classes": np.asarray([0]),
                },
            }
        ]
    )
    iou = float(box_iou_xyxy(np.asarray([[0, 0, 80.0, 80]]), np.asarray([[0, 0, 100.0, 100]])))
    res = ev.evaluate()
    n_pass = sum(1 for t in np.linspace(0.5, 0.95, 10) if iou >= t)
    expected = 100.0 * n_pass / 10 * (100.0 / 101.0 if False else 1.0)
    assert abs(res["bbox/AP"] - expected * 100 / 100) < 2.0, (res, iou, expected)


def test_rle_roundtrip(rng):
    m = rng.rand(37, 23) > 0.6
    rle = rle_encode(m)
    back = rle_decode(rle)
    np.testing.assert_array_equal(back, m)


def test_coco_eval_segm():
    m1 = np.zeros((100, 100), bool)
    m1[10:50, 10:50] = True
    gts = [
        {
            "image_id": 1,
            "annotations": [
                {
                    "bbox": [10, 10, 50, 50],
                    "category_id": 0,
                    "segmentation": rle_encode(m1),
                    "area": 1600,
                }
            ],
        }
    ]
    ev = COCOEvaluator(gts, "segm")
    ev.process(
        [
            {
                "image_id": 1,
                "instances": {
                    "boxes": np.asarray([[10, 10, 50, 50]]),
                    "scores": np.asarray([0.9]),
                    "classes": np.asarray([0]),
                    "masks": [m1],
                },
            }
        ]
    )
    res = ev.evaluate()
    assert abs(res["segm/AP"] - 100.0) < 1e-6


def test_sem_seg_evaluator():
    ev = SemSegEvaluator(num_classes=3)
    gt = np.asarray([[0, 0, 1], [1, 2, 255]])
    pred = np.asarray([[0, 1, 1], [1, 2, 0]])
    ev.process(pred, gt)
    res = ev.evaluate()
    # class0: tp1 gt2 pred1 -> iou 1/2; class1: tp2 union 3 -> 2/3; class2: 1
    assert abs(res["sem_seg/mIoU"] - 100 * (0.5 + 2 / 3 + 1) / 3) < 1e-4


def test_refcoco_evaluator():
    ev = RefCOCOEvaluator()
    ev.process(np.asarray([0, 0, 100, 100.0]), np.asarray([0, 0, 100, 100.0]))
    ev.process(np.asarray([0, 0, 50, 100.0]), np.asarray([0, 0, 100, 100.0]))  # iou 0.5
    res = ev.evaluate()
    assert res["refcoco/P@0.5"] == 50.0  # strict >
    assert res["refcoco/P@0.9"] == 50.0
    assert "refcoco/oIoU" not in res  # no masks processed


def test_refcoco_segm_oiou_miou():
    """Hand-computed segm grounding metrics (reference
    refcoco_evaluation.py:391-413 semantics)."""
    ev = RefCOCOEvaluator()
    box = np.asarray([0, 0, 10, 10.0])
    # expr 1: perfect 4x4 mask -> inter 16, union 16, iou 1
    g1 = np.zeros((10, 10), bool)
    g1[:4, :4] = True
    ev.process(box, box, g1.copy(), g1)
    # expr 2: half-overlapping -> pred rows 0..1, gt rows 0..3 (cols 0..3):
    # inter 8, union 16, iou 0.5
    p2 = np.zeros((10, 10), bool)
    p2[:2, :4] = True
    ev.process(box, box, p2, g1)
    # expr 3: missed (no prediction) -> inter 0, union = gt area 16, iou 0
    ev._total += 1
    ev.process_mask(None, g1)
    res = ev.evaluate()
    # oIoU = (16 + 8 + 0) / (16 + 16 + 16) = 0.5 ; mIoU = (1 + 0.5 + 0)/3
    assert abs(res["refcoco/oIoU"] - 50.0) < 1e-6
    assert abs(res["refcoco/mIoU"] - 100 * (1.5 / 3)) < 1e-6


def test_panoptic_evaluator():
    ev = PanopticEvaluator(num_classes=3, thing_ids={0})
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1  # segment 1 cat 0
    gt[5:] = 2  # segment 2 cat 1
    pred = np.zeros((10, 10), np.int32)
    pred[:5] = 7
    pred[5:] = 8
    ev.process(
        pred,
        [{"id": 7, "category_id": 0}, {"id": 8, "category_id": 1}],
        gt,
        [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}],
    )
    res = ev.evaluate()
    assert abs(res["panoptic/PQ"] - 100.0) < 1e-6


def test_suite_aggregation():
    out = aggregate_benchmark_suite(
        {"a": {"bbox/AP": 10.0}, "b": {"bbox/AP": 30.0}, "c": {"bbox/AP": 20.0}}
    )
    assert out["suite/mean_bbox/AP"] == 20.0
    assert out["suite/median_bbox/AP"] == 20.0


def test_lvis_federated_filtering():
    """LVIS: dets for unverified classes dropped; not-exhaustive classes don't
    accrue FPs from unmatched dets."""
    from ape_tpu.evaluation.lvis_eval import LVISEvaluator

    dicts = [
        {
            "image_id": 0,
            "annotations": [
                {"category_id": 1, "bbox": [0, 0, 10, 10], "area": 100.0}
            ],
            "neg_category_ids": [],
            "not_exhaustive_category_ids": [1],
        },
        {
            "image_id": 1,
            "annotations": [
                {"category_id": 2, "bbox": [0, 0, 10, 10], "area": 100.0}
            ],
        },
    ]
    preds = [
        {
            "image_id": 0,
            "instances": {
                # TP for cat 1, spurious unmatched cat-1 det (not-exhaustive ->
                # ignored), and a cat-2 det (unverified on img 0 -> dropped)
                "boxes": np.asarray(
                    [[0, 0, 10, 10], [50, 50, 60, 60], [0, 0, 10, 10]], np.float64
                ),
                "scores": np.asarray([0.9, 0.95, 0.99]),
                "classes": np.asarray([1, 1, 2]),
            },
        },
        {
            "image_id": 1,
            "instances": {
                "boxes": np.asarray([[0, 0, 10, 10]], np.float64),
                "scores": np.asarray([0.8]),
                "classes": np.asarray([2]),
            },
        },
    ]
    ev = LVISEvaluator(dicts, "bbox", 300)
    ev.process(preds)
    r = ev.evaluate()
    np.testing.assert_allclose(r["bbox/AP"], 100.0, atol=1e-6)


def test_plot_utils(tmp_path):
    """plot_logs reads metrics.json curves; plot_precision_recall reads PR npz
    (reference: ape/utils/plot_utils.py)."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import numpy as np

    from ape_tpu.utils.plot_utils import plot_logs, plot_precision_recall, _ewm

    run = tmp_path / "run1"
    run.mkdir()
    with open(run / "metrics.json", "w") as f:
        for i in range(5):
            f.write('{"iteration": %d, "total_loss": %f, "lr": 0.001}\n' % (i, 5.0 - i))
    fig, axs = plot_logs(run, fields=("total_loss", "lr"), ewm_col=1)
    assert len(axs) == 2

    # ewm smoothing: monotone input stays monotone, first element unsmoothed
    y = np.asarray([4.0, 3.0, 2.0])
    s = _ewm(y, com=1.0)
    assert s[0] == 4.0 and s[1] > 3.0 and (np.diff(s) < 0).all()

    npz = tmp_path / "pr_iter100.npz"
    np.savez(
        npz,
        precision=np.linspace(1, 0, 101)[None].repeat(10, 0),
        recall=np.linspace(0, 1, 101),
        scores=np.linspace(1, 0, 101)[None].repeat(10, 0),
    )
    fig2, axs2 = plot_precision_recall([npz])
    assert len(axs2) == 2


def test_save_pr_curves(tmp_path):
    """COCOEvaluator.save_pr_curves npz feeds plot_precision_recall."""
    gts = [make_gt(0, [[0, 0, 10.0, 10]], [1])]
    ev = COCOEvaluator(gts, "bbox")
    ev.process(
        [
            dict(
                image_id=0,
                instances=dict(
                    boxes=np.asarray([[0, 0, 10.0, 10]]),
                    scores=np.asarray([0.9]),
                    classes=np.asarray([1]),
                ),
            )
        ]
    )
    ev.evaluate()
    npz_path = tmp_path / "pr.npz"
    ev.save_pr_curves(npz_path)
    data = np.load(npz_path)
    assert data["precision"].shape == data["scores"].shape
    assert data["precision"].shape[1] == len(data["recall"])
    # perfect single detection: precision 1 up to recall 1.0 at every IoU thr
    assert data["precision"][0, 0] == 1.0 and data["precision"][0, -1] == 1.0

    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from ape_tpu.utils.plot_utils import plot_precision_recall

    fig, axs = plot_precision_recall([npz_path])
    assert len(axs) == 2
