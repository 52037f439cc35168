#!/usr/bin/env python3
"""Merge COCO instance annotations into LVIS v1 -> lvis_v1_train+coco_mask.json.

Reference behavior: /root/reference/datasets/tools/lvis/merge_lvis_coco.py —
the flagship's LVIS+COCO training group consumes this merged json:

  * COCO category ids map to LVIS category ids through the official
    coco->synset table (lvis-api data/coco_to_synset.json; stored here as
    datasets/assets/coco_to_lvis_synset.json). Unmapped categories drop.
  * Images pair by the last 16 chars of COCO `file_name` vs LVIS `coco_url`
    (`file_name` for v0.5 jsons).
  * A COCO annotation drops when its LVIS image lists the mapped category in
    `neg_category_ids`, or when it duplicates an LVIS box (IoU >= thresh with
    the SAME mapped category) — otherwise it's appended with its
    category_id/image_id rewritten. All annotation ids renumber from 1.
  * Per-category image_count/instance_count are recomputed over the merge.

This rebuild computes pairwise IoU in numpy (the reference used
detectron2.structures.pairwise_iou) and takes paths by CLI.
"""

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def pairwise_iou_xywh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix between [N,4] and [M,4] xywh boxes."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ax0, ay0 = a[:, 0], a[:, 1]
    ax1, ay1 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx0, by0 = b[:, 0], b[:, 1]
    bx1, by1 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.maximum(
        0.0,
        np.minimum(ax1[:, None], bx1[None]) - np.maximum(ax0[:, None], bx0[None]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(ay1[:, None], by1[None]) - np.maximum(ay0[:, None], by0[None]),
    )
    inter = ix * iy
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / union, 0.0)


def merge(coco_data, lvis_data, thresh=0.7, no_seg=False, synset_table=None):
    if synset_table is None:
        synset_table = json.load(
            open(
                os.path.join(
                    os.path.dirname(__file__), "..", "..", "assets",
                    "coco_to_lvis_synset.json",
                )
            )
        )
    synset2lvisid = {c["synset"]: c["id"] for c in lvis_data["categories"]}
    coco2lvis = {
        m["coco_cat_id"]: synset2lvisid[m["synset"]]
        for m in synset_table
        if m["synset"] in synset2lvisid
    }

    fkey = "file_name" if any("file_name" in im for im in lvis_data["images"]) and not any(
        "coco_url" in im for im in lvis_data["images"]
    ) else "coco_url"
    lvis_file2id = {im[fkey][-16:]: im["id"] for im in lvis_data["images"]}
    lvis_id2img = {im["id"]: im for im in lvis_data["images"]}

    coco_id2img = {im["id"]: im for im in coco_data["images"]}
    coco_img2anns = defaultdict(list)
    stats = defaultdict(int)
    for ann in coco_data["annotations"]:
        fn = coco_id2img[ann["image_id"]]["file_name"][-16:]
        if ann["category_id"] not in coco2lvis:
            stats["coco_unmapped_cat"] += 1
            continue
        if fn not in lvis_file2id:
            stats["coco_img_not_in_lvis"] += 1
            continue
        lvis_img_id = lvis_file2id[fn]
        lvis_cat = coco2lvis[ann["category_id"]]
        if lvis_cat in lvis_id2img[lvis_img_id].get("neg_category_ids", []):
            stats["coco_neg_category"] += 1
            continue
        ann = dict(ann, category_id=lvis_cat, image_id=lvis_img_id)
        coco_img2anns[fn].append(ann)
        stats["coco_candidates"] += 1

    lvis_img2anns = {im[fkey][-16:]: [] for im in lvis_data["images"]}
    for ann in lvis_data["annotations"]:
        lvis_img2anns[lvis_id2img[ann["image_id"]][fkey][-16:]].append(ann)

    anns = []
    next_id = 0
    for fn, lvis_anns in lvis_img2anns.items():
        coco_anns = coco_img2anns.get(fn, [])
        ious = pairwise_iou_xywh(
            np.asarray([a["bbox"] for a in coco_anns], np.float64).reshape(-1, 4),
            np.asarray([a["bbox"] for a in lvis_anns], np.float64).reshape(-1, 4),
        )
        for ann in lvis_anns:
            next_id += 1
            anns.append(dict(ann, id=next_id))
        for i, ann in enumerate(coco_anns):
            dup = any(
                ious[i, j] >= thresh
                and ann["category_id"] == lvis_anns[j]["category_id"]
                for j in range(len(lvis_anns))
            )
            if not dup:
                next_id += 1
                anns.append(dict(ann, id=next_id))
                stats["coco_added"] += 1
            else:
                stats["coco_duplicate"] += 1

    if no_seg:
        for ann in anns:
            ann.pop("segmentation", None)

    out = dict(lvis_data)
    out["annotations"] = anns
    img_count = {c["id"]: set() for c in out["categories"]}
    inst_count = {c["id"]: 0 for c in out["categories"]}
    for ann in anns:
        img_count[ann["category_id"]].add(ann["image_id"])
        inst_count[ann["category_id"]] += 1
    out["categories"] = [
        dict(c, image_count=len(img_count[c["id"]]), instance_count=inst_count[c["id"]])
        for c in out["categories"]
    ]
    return out, dict(stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coco_json", default="datasets/coco/annotations/instances_train2017.json")
    ap.add_argument("--lvis_json", default="datasets/lvis/lvis_v1_train.json")
    ap.add_argument("--out_json", default="datasets/lvis/lvis_v1_train+coco_mask.json")
    ap.add_argument("--thresh", type=float, default=0.7)
    ap.add_argument("--no_seg", action="store_true", help="drop masks (…+coco_box.json)")
    args = ap.parse_args()
    coco_data = json.load(open(args.coco_json))
    lvis_data = json.load(open(args.lvis_json))
    out, stats = merge(coco_data, lvis_data, args.thresh, args.no_seg)
    print(stats, "| images", len(out["images"]), "| anns", len(out["annotations"]))
    json.dump(out, open(args.out_json, "w"))


if __name__ == "__main__":
    main()
