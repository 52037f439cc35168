#!/usr/bin/env python3
"""Derive COCO semantic-segmentation PNGs from panoptic annotations.

Reference behavior: /root/reference/datasets/
prepare_coco_semantic_annos_from_panoptic_annos.py:18-84 — for every panoptic
annotation, decode the RGB id map (id = R + 256*G + 256^2*B), then write a
uint8 semantic mask where each panoptic category id maps to its contiguous
train id (its index in the 133-category panoptic list) and unlabeled pixels
are 255.

The reference hardcodes detectron2's COCO_CATEGORIES table for the id->trainId
map; that table is the panoptic json's own `categories` list sorted by id, so
this rebuild reads the map straight from the json (identical mapping, no
vendored table).

Usage:
    python datasets/prepare_coco_semantic_annos_from_panoptic_annos.py
Expects $DETECTRON2_DATASETS/coco/{annotations/panoptic_{split}.json,
panoptic_{split}/}; writes panoptic_semseg_{split}/.
"""

import argparse
import functools
import json
import multiprocessing as mp
import os

import numpy as np
from PIL import Image


def rgb2id(color: np.ndarray) -> np.ndarray:
    """COCO panoptic color encoding -> segment id (panopticapi convention)."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def panoptic_to_semantic(in_png, out_png, segments, id_map):
    pan = rgb2id(np.asarray(Image.open(in_png).convert("RGB")))
    sem = np.full(pan.shape, 255, np.uint8)
    for seg in segments:
        sem[pan == seg["id"]] = id_map[seg["category_id"]]
    Image.fromarray(sem).save(out_png)


def convert_split(panoptic_json, panoptic_root, sem_seg_root, workers=4):
    with open(panoptic_json) as f:
        obj = json.load(f)
    cats = sorted(obj["categories"], key=lambda c: c["id"])
    assert len(cats) <= 254, "uint8 train ids + 255 ignore"
    id_map = {c["id"]: i for i, c in enumerate(cats)}

    os.makedirs(sem_seg_root, exist_ok=True)
    jobs = [
        (
            os.path.join(panoptic_root, a["file_name"]),
            os.path.join(sem_seg_root, a["file_name"]),
            a["segments_info"],
        )
        for a in obj["annotations"]
    ]
    if workers > 1:
        with mp.Pool(workers) as pool:
            pool.starmap(
                functools.partial(panoptic_to_semantic, id_map=id_map), jobs,
                chunksize=100,
            )
    else:
        for in_png, out_png, segs in jobs:
            panoptic_to_semantic(in_png, out_png, segs, id_map)
    return len(jobs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.getenv("DETECTRON2_DATASETS", "datasets"))
    ap.add_argument("--splits", nargs="*", default=["val2017", "train2017"])
    ap.add_argument("--workers", type=int, default=max((os.cpu_count() or 2) // 2, 1))
    args = ap.parse_args()
    coco = os.path.join(args.root, "coco")
    for s in args.splits:
        n = convert_split(
            os.path.join(coco, f"annotations/panoptic_{s}.json"),
            os.path.join(coco, f"panoptic_{s}"),
            os.path.join(coco, f"panoptic_semseg_{s}"),
            workers=args.workers,
        )
        print(f"{s}: wrote {n} semantic masks")


if __name__ == "__main__":
    main()
