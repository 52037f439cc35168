"""Panoptic dataset mapper.

Capability match: DatasetMapper_detr_panoptic (/root/reference/ape/data/
dataset_mapper_detr_panoptic.py): read panoptic png (id = R + 256*G + 256^2*B),
thing segments become instances; stuff segments become instances with
``stuff_classes_offset`` added to their class and ``is_thing=False``; optional
``stuff_classes_decomposition`` splits stuff masks into connected components.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import numpy as np
from PIL import Image

from ape_tpu.data.mapper import DatasetMapperDETR

logger = logging.getLogger("ape_tpu")


def rgb2id(color: np.ndarray) -> np.ndarray:
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def connected_components(mask: np.ndarray) -> list:
    """4-connected components via BFS flood fill (pure numpy/python)."""
    from collections import deque

    h, w = mask.shape
    seen = np.zeros_like(mask, bool)
    comps = []
    ys, xs = np.nonzero(mask)
    for y0, x0 in zip(ys.tolist(), xs.tolist()):
        if seen[y0, x0]:
            continue
        comp = np.zeros_like(mask, bool)
        q = deque([(y0, x0)])
        seen[y0, x0] = True
        while q:
            y, x = q.popleft()
            comp[y, x] = True
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                    seen[ny, nx] = True
                    q.append((ny, nx))
        comps.append(comp)
    return comps


@dataclasses.dataclass
class DatasetMapperPanoptic(DatasetMapperDETR):
    stuff_classes_offset: int = 0
    stuff_classes_decomposition: bool = False

    def __call__(self, record: Dict) -> Optional[Dict]:
        if "pan_seg_file_name" not in record:
            return super().__call__(record)
        pan = rgb2id(np.asarray(Image.open(record["pan_seg_file_name"]).convert("RGB")))
        anns = list(record.get("annotations", []))
        for seg in record.get("segments_info", []):
            m = pan == seg["id"]
            if not m.any():
                continue
            if seg.get("isthing", True):
                parts = [m]
                cat = seg["category_id"]
                is_thing = True
            else:
                parts = connected_components(m) if self.stuff_classes_decomposition else [m]
                cat = seg["category_id"] + self.stuff_classes_offset
                is_thing = False
            for p in parts:
                ys, xs = np.nonzero(p)
                anns.append(
                    {
                        "bbox": [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        "category_id": cat,
                        "_mask": p,
                        "is_thing": is_thing,
                        "iscrowd": 0,
                    }
                )
        return super().__call__(dict(record, annotations=anns))
