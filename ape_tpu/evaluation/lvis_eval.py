"""LVIS-flavor evaluation.

Capability match: LVISEvaluator (/root/reference/ape/evaluation/lvis_evaluation.py:24-453):
max_dets=300 per image (no per-class cap), AP plus rare/common/frequent buckets
from per-category image counts, and the `not_exhaustive`/`neg_category_ids`
ignore handling reduced to per-class presence.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from ape_tpu.evaluation.coco_eval import COCOEvaluator

logger = logging.getLogger("ape_tpu")


class LVISEvaluator(COCOEvaluator):
    def __init__(
        self,
        dataset_dicts: List[dict],
        iou_type: str = "bbox",
        max_dets: int = 300,
        category_image_counts: Optional[Dict[int, int]] = None,
    ):
        super().__init__(dataset_dicts, iou_type, max_dets)
        if category_image_counts is None:
            # derive from the dataset: images per category
            from collections import defaultdict

            imgs = defaultdict(set)
            for d in dataset_dicts:
                for a in d.get("annotations", []):
                    imgs[a["category_id"]].add(d["image_id"])
            category_image_counts = {c: len(s) for c, s in imgs.items()}
        self.category_image_counts = category_image_counts

    def evaluate(self) -> Dict[str, float]:
        results = super().evaluate()
        suffix = "segm" if self.iou_type == "segm" else "bbox"
        buckets = {"r": [], "c": [], "f": []}
        for cat, ap in getattr(self, "per_class_ap", {}).items():
            n = self.category_image_counts.get(cat, 0)
            if n < 10:
                buckets["r"].append(ap)
            elif n <= 100:
                buckets["c"].append(ap)
            else:
                buckets["f"].append(ap)
        for k, v in buckets.items():
            results[f"{suffix}/AP{k}"] = 100 * float(np.mean(v)) if v else float("nan")
        return results
