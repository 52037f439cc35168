"""Category/prompt/count metadata tables for builtin datasets.

Capability match: the reference's ~9k LoC of dataset registration data
(/root/reference/ape/data/datasets/{odinw_categories,odinw_prompts,
seginw_categories,objects365,oid,inst_categories,
lvis_v1_coco_category_image_count,openimages_v6_category_image_count}.py).
The tables themselves are factual data (class names, ids, image counts, path
conventions) extracted into JSON assets under ``assets/``; the ODinW prompt
lambdas were evaluated against their category lists into static name->prompt
maps. Loaders are cached; heavyweight tables only parse on first use.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@functools.lru_cache(maxsize=None)
def _load(name: str):
    with open(os.path.join(_ASSETS, name)) as f:
        return json.load(f)


def odinw_categories() -> Dict[str, List[dict]]:
    return _load("odinw_categories.json")["ODINW_CATEGORIES"]


def odinw_prompts() -> Dict[str, Dict[str, str]]:
    """Static name->prompt maps (reference odinw_prompts.py lambdas applied)."""
    return _load("odinw_prompts.json")


def odinw_splits() -> Dict[str, Dict[str, list]]:
    return _load("odinw_splits.json")


def seginw_categories() -> Dict[str, List[dict]]:
    return _load("seginw_categories.json")["SEGINW_CATEGORIES"]


def seginw_splits() -> Dict[str, list]:
    return _load("seginw_splits.json")


def objects365_categories(fixname: bool = True) -> List[dict]:
    key = "OBJECTS365_CATEGORIES_FIXNAME" if fixname else "OBJECTS365_CATEGORIES"
    return _load("objects365_categories.json")[key]


def objects365_splits() -> Dict[str, list]:
    return _load("objects365_splits.json")


def oid_categories(version: str = "v6") -> List[dict]:
    d = _load("oid_categories.json")
    return {
        "2019": d["OPENIMAGES_2019_CATEGORIES"],
        "v6": d["OPENIMAGES_V6_CATEGORIES"],
        "seg": d["categories_seg"],
    }[version]


def oid_splits() -> Dict[str, Dict[str, list]]:
    return _load("oid_splits.json")


def d3_splits() -> Dict[str, list]:
    return _load("d3_splits.json")


def inst_categories(dataset: str) -> List[dict]:
    """Per-meta-dataset category tables (coco/cityscapes/mapillary/oid/...)."""
    return _load("inst_categories.json")[dataset]


def category_image_counts(dataset: str) -> Optional[Dict[int, int]]:
    """Per-category image counts for federated loss / LVIS r-c-f buckets."""
    if dataset.startswith("lvis"):
        rows = _load("lvis_v1_coco_category_image_count.json")[
            "LVIS_V1_COCO_CATEGORY_IMAGE_COUNT"
        ]
    elif dataset.startswith("openimages") or dataset.startswith("oid"):
        rows = _load("openimages_v6_category_image_count.json")[
            "OPENIMAGES_V6_CATEGORY_IMAGE_COUNT"
        ]
    else:
        return None
    return {int(r["id"]): int(r["image_count"]) for r in rows}


def fed_loss_cls_weights(dataset: str, freq_weight_power: float = 0.5) -> Optional[List[float]]:
    """count^power weights, ordered by category id (reference
    ape/data/detection_utils.py:29-127 get_fed_loss_cls_weights)."""
    counts = category_image_counts(dataset)
    if counts is None:
        return None
    ids = sorted(counts)
    return [counts[i] ** freq_weight_power for i in ids]


def thing_classes_with_prompts(odinw_dataset: str) -> List[str]:
    """ODinW vocabulary with per-dataset prompt rewording applied
    (reference odinw_instance.py::_get_builtin_metadata)."""
    cats = odinw_categories()[odinw_dataset]
    pmap = odinw_prompts().get(odinw_dataset, {})
    return [pmap.get(c["name"], c["name"]) for c in cats]
