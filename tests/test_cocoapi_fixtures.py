"""Checked-in expected-AP fixtures for the COCO/LVIS meters (VERDICT r3 #5).

pycocotools / lvis-api do not install in this environment, so the live
cross-check in tests/test_cocoapi_parity.py is importorskip-gated. This file
makes the meter validation run HERE, against frozen numbers:

- ``_protocol_oracle`` below is a second, independently written implementation
  of the published COCOeval protocol (greedy per-(img,cat) matching at 10 IoU
  thresholds with crowd/area-ignore semantics, 101-point interpolated AP).
  It shares no code with ape_tpu.evaluation.coco_eval (different structure:
  flat event lists, no class) — only the protocol itself.
- ``tests/fixtures/cocoapi_expected.json`` holds the oracle's metric values on
  the seeded scenarios from test_cocoapi_parity (the SAME scenarios the live
  pycocotools test evaluates, so any environment with the real API blesses
  these exact numbers too).
- The tests assert production evaluator == fixtures == oracle to 1e-3 AP pts.

Two same-spec implementations can share a misreading; the gated live test
remains the final arbiter. But agreement on randomized scenarios with crowds,
ignores, area buckets, ties and score jitter is strong drift protection.
"""

import json
import os

import numpy as np
import pytest

from test_cocoapi_parity import _scenario

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "cocoapi_expected.json")

IOU_T = np.linspace(0.5, 0.95, 10)
REC_T = np.linspace(0.0, 1.0, 101)
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _iou_matrix(det_boxes, gt_boxes, crowd):
    """xyxy IoU; crowd columns use intersection / det-area (IoF)."""
    n, m = len(det_boxes), len(gt_boxes)
    out = np.zeros((n, m))
    for i in range(n):
        dx0, dy0, dx1, dy1 = det_boxes[i]
        da = max(dx1 - dx0, 0.0) * max(dy1 - dy0, 0.0)
        for j in range(m):
            gx0, gy0, gx1, gy1 = gt_boxes[j]
            iw = min(dx1, gx1) - max(dx0, gx0)
            ih = min(dy1, gy1) - max(dy0, gy0)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            ga = max(gx1 - gx0, 0.0) * max(gy1 - gy0, 0.0)
            denom = da if crowd[j] else da + ga - inter
            out[i, j] = inter / max(denom, 1e-9)
    return out


def _match_one(dets, gts, area_rng, max_dets):
    """The evaluateImg step of the protocol, written flat.

    Returns (scores, tp[T,D], dt_ignore[T,D], n_real_gt) or None."""
    if not dets and not gts:
        return None
    lo, hi = area_rng
    order = np.argsort([-d["score"] for d in dets], kind="stable")[:max_dets]
    dets = [dets[i] for i in order]
    g_area = [
        g.get("area", max(g["bbox"][2] - g["bbox"][0], 0) * max(g["bbox"][3] - g["bbox"][1], 0))
        for g in gts
    ]
    g_ign = [bool(g.get("iscrowd", 0)) or not (lo <= a < hi) for g, a in zip(gts, g_area)]
    # protocol: GTs iterate ignored-last (stable)
    gorder = sorted(range(len(gts)), key=lambda j: g_ign[j])
    gts = [gts[j] for j in gorder]
    g_ign = [g_ign[j] for j in gorder]
    crowd = [bool(g.get("iscrowd", 0)) for g in gts]
    ious = _iou_matrix([d["bbox"] for d in dets], [g["bbox"] for g in gts], crowd)

    T, D, G = len(IOU_T), len(dets), len(gts)
    tp = np.zeros((T, D), bool)
    dt_ign = np.zeros((T, D), bool)
    for ti, thr in enumerate(IOU_T):
        g_taken = [-1] * G
        for di in range(D):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for gi in range(G):
                if g_taken[gi] >= 0 and not crowd[gi]:
                    continue
                if best >= 0 and not g_ign[best] and g_ign[gi]:
                    break  # only ignored GTs remain; keep the real match
                if ious[di, gi] < best_iou:
                    continue
                best, best_iou = gi, ious[di, gi]
            if best >= 0:
                g_taken[best] = di
                tp[ti, di] = not g_ign[best]
                dt_ign[ti, di] = g_ign[best]
            else:
                b = dets[di]["bbox"]
                a = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
                if not (lo <= a < hi):
                    dt_ign[ti, di] = True
    scores = np.asarray([d["score"] for d in dets])
    return scores, tp, dt_ign, int(np.sum(~np.asarray(g_ign, bool)))


def _ap_from_events(events):
    """The accumulate step: 101-point interpolated AP per IoU threshold."""
    n_gt = sum(e[3] for e in events)
    if n_gt == 0:
        return None
    scores = np.concatenate([e[0] for e in events]) if events else np.zeros(0)
    if scores.size == 0:
        return np.zeros(len(IOU_T))
    tp = np.concatenate([e[1] for e in events], axis=1)
    ig = np.concatenate([e[2] for e in events], axis=1)
    srt = np.argsort(-scores, kind="stable")
    tp, ig = tp[:, srt], ig[:, srt]
    aps = np.zeros(len(IOU_T))
    for ti in range(len(IOU_T)):
        keep = ~ig[ti]
        t = np.cumsum(tp[ti] & keep)
        f = np.cumsum(~tp[ti] & keep)
        rec = t / n_gt
        prec = t / np.maximum(t + f, 1e-9)
        for i in range(len(prec) - 1, 0, -1):
            prec[i - 1] = max(prec[i - 1], prec[i])
        idx = np.searchsorted(rec, REC_T, side="left")
        aps[ti] = np.where(idx < len(prec), prec[np.minimum(idx, len(prec) - 1)], 0.0).mean()
    return aps


def _protocol_oracle(gts, dets, max_dets=100, lvis=False):
    """Full COCO bbox metrics from the raw scenario dicts.

    lvis=True applies the LVIS protocol deltas: federated filtering (dets of a
    class neither in the image's GT nor its neg_category_ids are dropped),
    unmatched dets of a not_exhaustive_category_ids class are ignored, and the
    result carries per-class AP for rare/common/frequent bucketing."""
    by_ic_gt, by_ic_dt = {}, {}
    cats, imgs = set(), set()
    allowed, not_exh = {}, {}
    for g in gts:
        imgs.add(g["image_id"])
        pos = {a["category_id"] for a in g["annotations"]}
        allowed[g["image_id"]] = pos | set(g.get("neg_category_ids", []))
        not_exh[g["image_id"]] = set(g.get("not_exhaustive_category_ids", []))
        for a in g["annotations"]:
            cats.add(a["category_id"])
            by_ic_gt.setdefault((g["image_id"], a["category_id"]), []).append(a)
    for d in dets:
        inst = d["instances"]
        for b, s, c in zip(inst["boxes"], inst["scores"], inst["classes"]):
            if lvis and int(c) not in allowed.get(d["image_id"], {int(c)}):
                continue
            by_ic_dt.setdefault((d["image_id"], int(c)), []).append(
                {"bbox": [float(x) for x in b], "score": float(s)}
            )
    out = {}
    per_area = {k: [] for k in AREAS}
    ap50s, ap75s = [], []
    per_class = {}
    for cat in sorted(cats | {c for (_, c) in by_ic_dt}):
        for aname, rng in AREAS.items():
            events = []
            for img in sorted(imgs):
                e = _match_one(
                    by_ic_dt.get((img, cat), []), by_ic_gt.get((img, cat), []), rng, max_dets
                )
                if e is not None:
                    if lvis and cat in not_exh.get(img, ()):
                        scores, tp, dt_ign, n_gt = e
                        e = (scores, tp, dt_ign | ~tp, n_gt)
                    events.append(e)
            aps = _ap_from_events(events) if events else None
            if aps is None:
                continue
            per_area[aname].append(aps.mean())
            if aname == "all":
                ap50s.append(aps[0])
                ap75s.append(aps[5])
                per_class[cat] = float(aps.mean())
    out["bbox/AP"] = 100 * float(np.mean(per_area["all"])) if per_area["all"] else float("nan")
    out["bbox/AP50"] = 100 * float(np.mean(ap50s)) if ap50s else float("nan")
    out["bbox/AP75"] = 100 * float(np.mean(ap75s)) if ap75s else float("nan")
    for k in ("small", "medium", "large"):
        v = per_area[k]
        out[f"bbox/AP{k[0]}"] = 100 * float(np.mean(v)) if v else float("nan")
    out["_per_class"] = per_class
    return out


def _lvis_scenario(seed=0, n_cats=12):
    """COCO scenario + LVIS federated fields and skewed category frequencies.

    Detections are generated UNFILTERED (some hit classes outside the image's
    allowed set) so the federated drop actually fires; image counts are
    injected so rare (<10), common (10..100) and frequent (>100) all populate.
    """
    rng = np.random.RandomState(1000 + seed)
    gts, dets = _scenario(seed, n_imgs=8, n_cats=n_cats, max_gt=6, max_det=12)
    for g in gts:
        pool = [c for c in range(1, n_cats + 1)]
        g["neg_category_ids"] = list(
            rng.choice(pool, size=rng.randint(0, 4), replace=False).astype(int)
        )
        g["not_exhaustive_category_ids"] = list(
            rng.choice(pool, size=rng.randint(0, 2), replace=False).astype(int)
        )
    counts = {c: int(rng.choice([3, 40, 400])) for c in range(1, n_cats + 1)}
    return gts, dets, counts


def _lvis_oracle(gts, dets, counts):
    out = _protocol_oracle(gts, dets, max_dets=300, lvis=True)
    per_class = out.pop("_per_class")
    buckets = {"r": [], "c": [], "f": []}
    for cat, ap in per_class.items():
        n = counts.get(cat, 0)
        buckets["r" if n < 10 else "c" if n <= 100 else "f"].append(ap)
    for k, v in buckets.items():
        out[f"bbox/AP{k}"] = 100 * float(np.mean(v)) if v else float("nan")
    return out


KEYS = ["bbox/AP", "bbox/AP50", "bbox/AP75", "bbox/APs", "bbox/APm", "bbox/APl"]


def _load_fixtures():
    with open(FIXTURE_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluator_matches_fixture(seed):
    from ape_tpu.evaluation.coco_eval import COCOEvaluator

    gts, dets = _scenario(seed, n_cats=4)
    ev = COCOEvaluator(gts, "bbox", max_dets=100)
    ev.process(dets)
    got = ev.evaluate()
    want = _load_fixtures()["coco_bbox"][str(seed)]
    for k in KEYS:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert abs(got[k] - want[k]) <= 1e-3, (k, got[k], want[k])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_matches_fixture(seed):
    """If the checked-in numbers are ever regenerated wrong, the independent
    protocol implementation disagrees here."""
    gts, dets = _scenario(seed, n_cats=4)
    got = _protocol_oracle(gts, dets)
    want = _load_fixtures()["coco_bbox"][str(seed)]
    for k in KEYS:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert abs(got[k] - want[k]) <= 1e-3, (k, got[k], want[k])


LVIS_KEYS = KEYS + ["bbox/APr", "bbox/APc", "bbox/APf"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lvis_evaluator_matches_fixture(seed):
    from ape_tpu.evaluation.lvis_eval import LVISEvaluator

    gts, dets, counts = _lvis_scenario(seed)
    ev = LVISEvaluator(gts, "bbox", max_dets=300, category_image_counts=counts)
    ev.process(dets)
    got = ev.evaluate()
    want = _load_fixtures()["lvis_bbox"][str(seed)]
    for k in LVIS_KEYS:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert abs(got[k] - want[k]) <= 1e-3, (k, got[k], want[k])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lvis_oracle_matches_fixture(seed):
    gts, dets, counts = _lvis_scenario(seed)
    got = _lvis_oracle(gts, dets, counts)
    want = _load_fixtures()["lvis_bbox"][str(seed)]
    for k in LVIS_KEYS:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            assert abs(got[k] - want[k]) <= 1e-3, (k, got[k], want[k])


if __name__ == "__main__":
    # regenerate the fixture file from the oracles
    fix = {"coco_bbox": {}, "lvis_bbox": {}}
    for seed in (0, 1, 2):
        gts, dets = _scenario(seed, n_cats=4)
        out = _protocol_oracle(gts, dets)
        out.pop("_per_class", None)
        fix["coco_bbox"][str(seed)] = {k: round(v, 6) for k, v in out.items()}
        gts, dets, counts = _lvis_scenario(seed)
        fix["lvis_bbox"][str(seed)] = {
            k: round(v, 6) for k, v in _lvis_oracle(gts, dets, counts).items()
        }
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    with open(FIXTURE_PATH, "w") as f:
        json.dump(fix, f, indent=1, sort_keys=True)
    print("wrote", FIXTURE_PATH)
