#!/usr/bin/env python3
"""Build `refcoco-mixed_group-by-image/instances_cocofied_train.json`.

Reference behavior: /root/reference/datasets/tools/seqtr2coco/
convert_refcoco_mixed_group_by_image.py — unlike the plain mix (one synthetic
image per referred object), this groups by the REAL underlying COCO image:

  * cocofy the train split of refcoco-unc/refcocog-umd/refcocoplus-unc, but
    keep the expression list on the ANNOTATION (`phrases`);
  * dedupe images by file_name (height/width must agree);
  * fan each annotation out to ONE COPY PER PHRASE (`phrase` field), with
    contiguous 0-based image and annotation ids.

This is the json behind the reference's `refcoco-mixed_group-by-image`
training group (group-by-image phrase grounding).
"""

import argparse
import copy
import json
import os

from convert_ref2coco import segmentation_area  # noqa: E402 (same dir)

DATASETS = ["refcoco-unc", "refcocog-umd", "refcocoplus-unc"]


def cocofy_train_with_phrases(data):
    """SeqTR {split: [records]} -> cocofied train dict, expressions kept on
    the annotation as `phrases` (one synthetic image per record)."""
    out = {
        "images": [],
        "annotations": [],
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    for i, rec in enumerate(data.get("train", []), 1):
        out["images"].append(
            {
                "file_name": "COCO_train2014_%012d.jpg" % rec["image_id"],
                "height": rec["height"],
                "width": rec["width"],
                "id": i,
            }
        )
        out["annotations"].append(
            {
                "bbox": rec["bbox"],
                "segmentation": rec["mask"],
                "image_id": i,
                "iscrowd": 0,
                "category_id": 1,
                "id": i,
                "area": segmentation_area(rec["mask"]),
                "phrases": rec["expressions"],
            }
        )
    return out


def group_by_image(cocofied_list):
    file_to_image = {}
    file_to_anns = {}
    for data in cocofied_list:
        id_to_img = {im["id"]: im for im in data["images"]}
        for im in data["images"]:
            if im["file_name"] in file_to_image:
                prev = file_to_image[im["file_name"]]
                assert prev["height"] == im["height"] and prev["width"] == im["width"]
            else:
                file_to_image[im["file_name"]] = im
        for ann in data["annotations"]:
            fn = id_to_img[ann["image_id"]]["file_name"]
            file_to_anns.setdefault(fn, []).append(ann)

    images, annotations = [], []
    img_id = 0
    ann_id = 0
    for fn, image in file_to_image.items():
        image = dict(image, id=img_id)
        images.append(image)
        for ann in file_to_anns.get(fn, []):
            phrases = ann["phrases"]
            base = {k: v for k, v in ann.items() if k != "phrases"}
            for phrase in phrases:
                a = copy.deepcopy(base)
                a["phrase"] = phrase
                a["id"] = ann_id
                a["image_id"] = img_id
                annotations.append(a)
                ann_id += 1
        img_id += 1
    return {
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/SeqTR")
    args = ap.parse_args()
    cocofied = [
        cocofy_train_with_phrases(
            json.load(open(os.path.join(args.root, ds, "instances.json")))
        )
        for ds in DATASETS
    ]
    merged = group_by_image(cocofied)
    out_dir = os.path.join(args.root, "refcoco-mixed_group-by-image")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "instances_cocofied_train.json")
    json.dump(merged, open(out, "w"))
    print({k: len(v) for k, v in merged.items()}, "->", out)


if __name__ == "__main__":
    main()
