"""Benchmark evaluation runner: dataset -> APE wrapper -> evaluators.

Capability match: do_test (/root/reference/tools/train_net.py:423-509):
per-benchmark loop with set_eval_dataset, inference_on_dataset, evaluator
dispatch by ``evaluator_type`` (coco / lvis / sem_seg / panoptic / refcoco —
reference wires these via each config's evaluator class), suite mean+median
aggregation. Mask AP uses host-side box-crop pasting of the
mask-feature-resolution logits (the BitMasks.crop_and_resize equivalent).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from ape_tpu.data.catalog import DatasetCatalog, MetadataCatalog, get_text_list
from ape_tpu.engine.trainer import inference_on_dataset

logger = logging.getLogger("ape_tpu")


def paste_masks(mask_logits: np.ndarray, boxes: np.ndarray, h: int, w: int) -> List[np.ndarray]:
    """Per-instance full-image binary masks from feature-res logits + boxes."""
    from PIL import Image

    out = []
    for i in range(len(boxes)):
        prob = 1.0 / (1.0 + np.exp(-mask_logits[i]))
        full = np.asarray(
            Image.fromarray((prob * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR)
        )
        m = np.zeros((h, w), bool)
        x0, y0, x1, y1 = [int(round(v)) for v in boxes[i]]
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x1 > x0 and y1 > y0:
            m[y0:y1, x0:x1] = full[y0:y1, x0:x1] > 127
        out.append(m)
    return out


def upsample_prob_maps(probs: np.ndarray, h: int, w: int, chunk: int = 64) -> np.ndarray:
    """Bilinear upsample (T, Hm, Wm) -> (T, h, w) on host, chunked over T."""
    from PIL import Image

    t = probs.shape[0]
    out = np.empty((t, h, w), np.float32)
    for i in range(t):
        out[i] = np.asarray(
            Image.fromarray(probs[i].astype(np.float32)).resize((w, h), Image.BILINEAR)
        )
    return out


def resolve_evaluator_type(dataset_name: str, override: Optional[str] = None) -> str:
    if override:
        return override
    meta = MetadataCatalog.get(dataset_name)
    return meta.get("evaluator_type", "coco")


def _eval_detection(ape, dataset_name, mapper, iou_types, max_dets, lvis, rank, world_size):
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.evaluation.coco_eval import COCOEvaluator
    from ape_tpu.evaluation.lvis_eval import LVISEvaluator

    dicts = DatasetCatalog.get(dataset_name)
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)
    cls = LVISEvaluator if lvis else COCOEvaluator
    evaluators = {t: cls(dicts, t, max_dets) for t in iou_types}

    def forward(ex):
        pred = ape([ex])[0]
        inst = pred.get("instances", {})
        boxes = np.asarray(inst.get("boxes", np.zeros((0, 4))))
        h, w = ex.get("height", 0), ex.get("width", 0)
        record = {
            "image_id": ex.get("image_id", ex.get("dataset_dict", {}).get("image_id", 0)),
            "instances": {
                "boxes": boxes,
                "scores": np.asarray(inst.get("scores", [])),
                "classes": np.asarray(inst.get("classes", [])),
            },
        }
        if "segm" in iou_types and "mask_logits" in inst and h and w:
            record["instances"]["masks"] = paste_masks(inst["mask_logits"], boxes, h, w)
        return record

    return inference_on_dataset(forward, loader, list(evaluators.values()))


def _eval_oid(ape, dataset_name, mapper, max_dets, rank, world_size):
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.evaluation.oid_eval import OIDEvaluator

    dicts = DatasetCatalog.get(dataset_name)
    meta = MetadataCatalog.get(dataset_name)
    ev = OIDEvaluator(
        dicts, ancestors=meta.get("class_ancestors"), max_dets=max_dets
    )
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)

    def forward(ex):
        pred = ape([ex])[0]
        inst = pred.get("instances", {})
        return {
            "image_id": ex.get("image_id", ex.get("dataset_dict", {}).get("image_id", 0)),
            "instances": {
                "boxes": np.asarray(inst.get("boxes", np.zeros((0, 4)))),
                "scores": np.asarray(inst.get("scores", [])),
                "classes": np.asarray(inst.get("classes", [])),
            },
        }

    return inference_on_dataset(forward, loader, [ev])


def _eval_sem_seg(ape, dataset_name, mapper, rank, world_size):
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.evaluation.other_evals import SemSegEvaluator

    meta = MetadataCatalog.get(dataset_name)
    num_classes = len(get_text_list(meta))
    ev = SemSegEvaluator(num_classes, ignore_label=meta.get("ignore_label", 255))
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)

    times = 0
    for ex in loader():
        pred = ape([ex])[0]
        if "sem_seg" not in pred:
            continue
        dd = ex.get("dataset_dict", {})
        gt = dd.get("sem_seg")
        if gt is None and dd.get("sem_seg_file_name"):
            from PIL import Image

            gt = np.asarray(Image.open(dd["sem_seg_file_name"]))
        if gt is None:
            continue
        h, w = gt.shape[:2]
        probs = upsample_prob_maps(np.asarray(pred["sem_seg"]), h, w)
        ev.process(probs.argmax(0), gt)
        times += 1
    if times == 0:
        logger.warning(f"{dataset_name}: no semantic GT found")
    return ev.evaluate()


def _eval_refcoco(ape, dataset_name, mapper, rank, world_size):
    """P@0.5-0.9 of the top-1 box per referring expression, plus segm
    oIoU/mIoU of the top-1 mask when GT masks exist and the model emits them
    (reference refcoco_evaluation.py:31-753, segm derivation :391-413)."""
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.data.transforms import polygons_to_mask, rle_decode
    from ape_tpu.evaluation.other_evals import RefCOCOEvaluator

    def gt_mask_of(ann, h, w):
        seg = ann.get("segmentation")
        if seg is None or not h or not w:
            return None
        if isinstance(seg, dict):
            return rle_decode(seg, h, w)
        if isinstance(seg, list) and seg:
            return polygons_to_mask(seg, h, w)
        return np.asarray(seg, bool) if np.ndim(seg) == 2 else None

    ev = RefCOCOEvaluator()
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)
    for ex in loader():
        dd = ex.get("dataset_dict", {})
        h, w = ex.get("height", 0), ex.get("width", 0)
        for ann in dd.get("annotations", []):
            exprs = ann.get("expressions") or ([] if "expression" not in ann else [ann["expression"]])
            if not exprs:
                continue
            x, y, bw, bh = ann["bbox"]
            gt = np.asarray([x, y, x + bw, y + bh], np.float32)
            gmask = gt_mask_of(ann, h, w)
            for expr in exprs:
                ex2 = dict(ex)
                ex2["text_prompt"] = expr
                pred = ape([ex2])[0]
                inst = pred.get("instances", {})
                boxes = np.asarray(inst.get("boxes", np.zeros((0, 4))))
                scores = np.asarray(inst.get("scores", np.zeros((0,))))
                if len(boxes) == 0:
                    ev._total += 1
                    if gmask is not None:
                        ev.process_mask(None, gmask)
                    continue
                top = int(scores.argmax())
                pmask = None
                if gmask is not None and "mask_logits" in inst:
                    pmask = paste_masks(
                        np.asarray(inst["mask_logits"])[top : top + 1],
                        boxes[top : top + 1],
                        h,
                        w,
                    )[0]
                ev.process(boxes[top], gt, pmask, gmask)
    return ev.evaluate()


def _eval_panoptic(ape, dataset_name, mapper, rank, world_size):
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.evaluation.other_evals import PanopticEvaluator
    from ape_tpu.evaluation.panoptic_merge import panoptic_merge

    meta = MetadataCatalog.get(dataset_name)
    text_list = get_text_list(meta)
    thing = set(meta.get("thing_ids", range(len(meta.get("thing_classes", []) or []))))
    ev = PanopticEvaluator(len(text_list), thing_ids=thing)
    was = ape.panoptic_on
    ape.panoptic_on = True
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)
    try:
        for ex in loader():
            pred = ape([ex])[0]
            raw = pred.get("panoptic_raw")
            dd = ex.get("dataset_dict", {})
            gt_seg, gt_info = dd.get("pan_seg"), dd.get("segments_info")
            if raw is None or gt_seg is None:
                continue
            h, w = gt_seg.shape[:2]
            masks_prob = 1.0 / (1.0 + np.exp(-upsample_prob_maps(raw["mask_logits"], h, w)))
            seg, info = panoptic_merge(
                raw["scores"], raw["labels"], raw["raw_scores"], masks_prob, thing
            )
            ev.process(seg, info, np.asarray(gt_seg), list(gt_info))
    finally:
        ape.panoptic_on = was
    return ev.evaluate()


def evaluate_dataset(
    ape,
    dataset_name: str,
    mapper,
    iou_types=("bbox",),
    max_dets: int = 100,
    rank: int = 0,
    world_size: int = 1,
    evaluator_type: Optional[str] = None,
) -> Dict[str, float]:
    """Route by evaluator type (reference tools/train_net.py:455-472)."""
    import os

    ape.set_eval_dataset(dataset_name)
    if os.environ.get("APE_PROFILE_STAGES") and hasattr(ape, "profile_stage_times"):
        from ape_tpu.data.build import build_detection_test_loader

        loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)
        for ex in loader():
            times = ape.profile_stage_times(ex)
            logger.info(
                "stage times: "
                + ", ".join(f"{k} {v * 1e3:.1f}ms" for k, v in times.items())
            )
            break
    etype = resolve_evaluator_type(dataset_name, evaluator_type)
    if etype in ("coco", "coco_panoptic_seg", "lvis"):
        return _eval_detection(
            ape, dataset_name, mapper, iou_types, max_dets,
            lvis=(etype == "lvis"), rank=rank, world_size=world_size,
        )
    if etype == "oid":
        return _eval_oid(
            ape, dataset_name, mapper, max(max_dets, 1000), rank, world_size
        )
    if etype == "sem_seg":
        return _eval_sem_seg(ape, dataset_name, mapper, rank, world_size)
    if etype == "refcoco":
        return _eval_refcoco(ape, dataset_name, mapper, rank, world_size)
    if etype == "panoptic":
        return _eval_panoptic(ape, dataset_name, mapper, rank, world_size)
    raise ValueError(f"unknown evaluator_type {etype!r} for {dataset_name}")
