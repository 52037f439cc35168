"""API-parity vs pycocotools / lvis-api (VERDICT round-2 weak #9).

Neither package installs in this environment, so these tests are gated with
importorskip — they run (and must pass) in any environment that has the real
APIs, validating our from-scratch evaluators against the canonical meters on a
randomized-but-seeded scenario. |delta AP| <= 0.001 on every headline metric.

The in-env counterpart is tests/test_coco_protocol.py (hand-computed edge
cases); this file is the cross-implementation check.
"""

import numpy as np
import pytest


def _scenario(seed=0, n_imgs=8, n_cats=4, max_gt=6, max_det=12):
    """Random boxes with deliberate overlaps, crowds, and area spread."""
    rng = np.random.RandomState(seed)
    gts, dets = [], []
    for img in range(n_imgs):
        anns = []
        for _ in range(rng.randint(1, max_gt + 1)):
            # log-spread sizes so area ranges small/medium/large all populate
            size = float(np.exp(rng.uniform(np.log(8), np.log(300))))
            x0 = rng.uniform(0, 600)
            y0 = rng.uniform(0, 600)
            anns.append(
                dict(
                    category_id=int(rng.randint(1, n_cats + 1)),
                    bbox=[x0, y0, x0 + size, y0 + size * rng.uniform(0.5, 2.0)],
                    iscrowd=int(rng.rand() < 0.1),
                )
            )
        gts.append(dict(image_id=img, annotations=anns))
        boxes, scores, classes = [], [], []
        for ann in anns:
            # jittered copies of GT (some matches at varying IoU) + noise dets
            for _ in range(rng.randint(0, 3)):
                b = np.asarray(ann["bbox"], float)
                w = b[2] - b[0]
                h = b[3] - b[1]
                jit = rng.uniform(-0.3, 0.3, 4) * [w, h, w, h]
                boxes.append(b + jit)
                scores.append(rng.rand())
                classes.append(
                    ann["category_id"] if rng.rand() < 0.8 else int(rng.randint(1, n_cats + 1))
                )
        for _ in range(rng.randint(0, max_det // 2)):
            x0 = rng.uniform(0, 600)
            y0 = rng.uniform(0, 600)
            s = rng.uniform(5, 200)
            boxes.append([x0, y0, x0 + s, y0 + s])
            scores.append(rng.rand())
            classes.append(int(rng.randint(1, n_cats + 1)))
        dets.append(
            dict(
                image_id=img,
                instances=dict(
                    boxes=np.asarray(boxes, float).reshape(-1, 4),
                    scores=np.asarray(scores, float),
                    classes=np.asarray(classes, np.int64),
                ),
            )
        )
    return gts, dets


def _to_cocoapi(gts, dets, n_cats):
    """Our dict format -> pycocotools COCO dataset + results list."""
    images = [dict(id=g["image_id"], width=1000, height=1000) for g in gts]
    annotations = []
    aid = 1
    for g in gts:
        for a in g["annotations"]:
            x0, y0, x1, y1 = a["bbox"]
            annotations.append(
                dict(
                    id=aid, image_id=g["image_id"], category_id=a["category_id"],
                    bbox=[x0, y0, x1 - x0, y1 - y0],
                    area=(x1 - x0) * (y1 - y0), iscrowd=a["iscrowd"],
                )
            )
            aid += 1
    dataset = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=i, name=f"c{i}") for i in range(1, n_cats + 1)],
    )
    results = []
    for d in dets:
        inst = d["instances"]
        for b, s, c in zip(inst["boxes"], inst["scores"], inst["classes"]):
            results.append(
                dict(
                    image_id=d["image_id"], category_id=int(c),
                    bbox=[b[0], b[1], b[2] - b[0], b[3] - b[1]], score=float(s),
                )
            )
    return dataset, results


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_bbox_ap_matches_pycocotools(seed):
    pycoco = pytest.importorskip("pycocotools.coco")
    cocoeval = pytest.importorskip("pycocotools.cocoeval")

    from ape_tpu.evaluation.coco_eval import COCOEvaluator

    n_cats = 4
    gts, dets = _scenario(seed, n_cats=n_cats)
    ours = COCOEvaluator(gts, "bbox", max_dets=100)
    ours.process(dets)
    r = ours.evaluate()

    dataset, results = _to_cocoapi(gts, dets, n_cats)
    coco = pycoco.COCO()
    coco.dataset = dataset
    coco.createIndex()
    cdt = coco.loadRes(results)
    E = cocoeval.COCOeval(coco, cdt, "bbox")
    E.params.maxDets = [1, 10, 100]
    E.evaluate()
    E.accumulate()
    E.summarize()
    # stats: AP, AP50, AP75, APs, APm, APl, AR1, AR10, AR100, ARs, ARm, ARl
    pairs = [
        ("bbox/AP", E.stats[0]), ("bbox/AP50", E.stats[1]),
        ("bbox/AP75", E.stats[2]), ("bbox/APs", E.stats[3]),
        ("bbox/APm", E.stats[4]), ("bbox/APl", E.stats[5]),
    ]
    for key, ref in pairs:
        if key not in r or ref == -1:
            continue
        assert abs(r[key] - 100 * ref) <= 0.1, (key, r[key], 100 * ref)
