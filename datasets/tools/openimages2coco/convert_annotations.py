#!/usr/bin/env python3
"""Open Images (v4-v6 / challenge_2019) CSV annotations -> COCO-style json
(`openimages_{version}_{subset}_bbox[_nogroup].json`).

Reference behavior: /root/reference/datasets/tools/openimages2coco/
convert_annotations.py + utils.py (openimages2coco lineage), bbox task —
the path APE's OID detection training/eval jsons come from:

  * categories: 1-based ids in class-description CSV order, with freebase_id;
  * images: id = ImageID (string), file_name `<ImageID>.jpg`,
    pos/neg_category_ids from the human image-label CSV (Confidence 1/0 —
    these drive the LVIS-protocol federated eval), sizes from the bundled
    size tables (data/*.csv) or the image file on disk;
  * annotations: normalized XMin/XMax/YMin/YMax scaled by the image size into
    absolute xywh rounded to 2 decimals, IsOccluded/IsTruncated/IsGroupOf/
    IsDepiction/IsInside carried through;
  * --exclude-group (reference remove_group.py semantics): drop every image
    that has any IsGroupOf annotation, and all group annotations.

The segmentation/panoptic tasks of the vendored upstream need the per-box
mask PNG dumps and are not rebuilt here; APE consumes the bbox jsons.
"""

import argparse
import csv
import json
import os
from collections import defaultdict


def csvread(path):
    with open(path, newline="") as f:
        return list(csv.reader(f))


def rows_as_dicts(rows):
    header = rows[0]
    return [dict(zip(header, r)) for r in rows[1:]]


def convert_categories(category_rows):
    return [
        {"id": i + 1, "name": row[1], "freebase_id": row[0]}
        for i, row in enumerate(category_rows)
    ]


def convert_images(meta_rows, label_rows, size_rows, image_dir, categories):
    cats_by_fb = {c["freebase_id"]: c["id"] for c in categories}
    pos = defaultdict(list)
    neg = defaultdict(list)
    for ann in rows_as_dicts(label_rows):
        cid = cats_by_fb[ann["LabelName"]]
        if int(ann["Confidence"]) == 1:
            pos[ann["ImageID"]].append(cid)
        elif int(ann["Confidence"]) == 0:
            neg[ann["ImageID"]].append(cid)
    sizes = {r[0]: (int(r[1]), int(r[2])) for r in (size_rows or [])[1:]}

    images = []
    for rec in rows_as_dicts(meta_rows):
        key = rec["ImageID"]
        img = {
            "id": key,
            "file_name": key + ".jpg",
            "neg_category_ids": neg.get(key, []),
            "pos_category_ids": pos.get(key, []),
        }
        if key in sizes:
            img["width"], img["height"] = sizes[key]
        else:
            from PIL import Image

            with Image.open(os.path.join(image_dir, img["file_name"])) as im:
                img["width"], img["height"] = im.width, im.height
        images.append(img)
    return images


ATTRIBUTES = ["IsOccluded", "IsTruncated", "IsGroupOf", "IsDepiction", "IsInside"]


def convert_instances(ann_rows, images, categories, start_index=0):
    imgs = {im["id"]: im for im in images}
    cats_by_fb = {c["freebase_id"]: c["id"] for c in categories}
    annotations = []
    for i, rec in enumerate(rows_as_dicts(ann_rows)):
        img = imgs[rec["ImageID"]]
        xmin = float(rec["XMin"]) * img["width"]
        ymin = float(rec["YMin"]) * img["height"]
        dx = float(rec["XMax"]) * img["width"] - xmin
        dy = float(rec["YMax"]) * img["height"] - ymin
        ann = {
            "id": i + start_index,
            "image_id": img["id"],
            "freebase_id": rec["LabelName"],
            "category_id": cats_by_fb[rec["LabelName"]],
            "iscrowd": False,
            "bbox": [round(v, 2) for v in (xmin, ymin, dx, dy)],
            "area": round(dx * dy, 2),
        }
        for attr in ATTRIBUTES:
            ann[attr] = int(rec[attr]) if attr in rec else 0
        annotations.append(ann)
    return annotations


def exclude_group(images, annotations):
    group_imgs = {a["image_id"] for a in annotations if a["IsGroupOf"]}
    return (
        [im for im in images if im["id"] not in group_imgs],
        [a for a in annotations if not a["IsGroupOf"]],
    )


SOURCES = {
    # (subset, challenge): (category, image_meta, bbox_ann, image_label, sizes)
    ("train", False): (
        "class-descriptions-boxable.csv", "train-images-boxable-with-rotation.csv",
        "oidv6-train-annotations-bbox.csv",
        "train-annotations-human-imagelabels-boxable.csv",
        "train_sizes-00000-of-00001.csv",
    ),
    ("val", False): (
        "class-descriptions-boxable.csv", "validation-images-with-rotation.csv",
        "validation-annotations-bbox.csv",
        "validation-annotations-human-imagelabels-boxable.csv",
        "validation_sizes-00000-of-00001.csv",
    ),
    ("test", False): (
        "class-descriptions-boxable.csv", "test-images-with-rotation.csv",
        "test-annotations-bbox.csv",
        "test-annotations-human-imagelabels-boxable.csv", None,
    ),
    ("train", True): (
        "challenge-2019-classes-description-500.csv",
        "train-images-boxable-with-rotation.csv",
        "challenge-2019-train-detection-bbox.csv",
        "challenge-2019-train-detection-human-imagelabels.csv",
        "train_sizes-00000-of-00001.csv",
    ),
    ("val", True): (
        "challenge-2019-classes-description-500.csv",
        "validation-images-with-rotation.csv",
        "challenge-2019-validation-detection-bbox.csv",
        "challenge-2019-validation-detection-human-imagelabels.csv",
        "validation_sizes-00000-of-00001.csv",
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True)
    ap.add_argument("--version", default="v6",
                    choices=["v4", "v5", "v6", "challenge_2019"])
    ap.add_argument("--subsets", nargs="+", default=["val", "train"],
                    choices=["train", "val", "test"])
    ap.add_argument("--exclude-group", dest="exclude_group", action="store_true")
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    for subset in args.subsets:
        cat_f, meta_f, ann_f, label_f, size_f = SOURCES[
            (subset, args.version == "challenge_2019")
        ]
        if args.version in ("v4", "v5") and subset == "train":
            ann_f = "train-annotations-bbox.csv"
        ann_dir = os.path.join(args.path, "annotations")
        categories = convert_categories(csvread(os.path.join(ann_dir, cat_f)))
        size_rows = (
            csvread(os.path.join(here, "data", size_f)) if size_f and
            os.path.exists(os.path.join(here, "data", size_f)) else None
        )
        image_dir = os.path.join(
            args.path, "validation" if subset == "val" else subset
        )
        images = convert_images(
            csvread(os.path.join(ann_dir, meta_f)),
            csvread(os.path.join(ann_dir, label_f)),
            size_rows, image_dir, categories,
        )
        annotations = convert_instances(
            csvread(os.path.join(ann_dir, ann_f)), images, categories
        )
        if args.exclude_group:
            images, annotations = exclude_group(images, annotations)
        out = {
            "info": {"description": f"Open Images Dataset {args.version}",
                     "version": args.version},
            "licenses": [],
            "categories": categories,
            "images": images,
            "annotations": annotations,
        }
        tag = "_nogroup" if args.exclude_group else ""
        dst = os.path.join(
            ann_dir, f"openimages_{args.version}_{subset}_bbox{tag}.json"
        )
        json.dump(out, open(dst, "w"))
        print(subset, len(images), "images,", len(annotations), "anns ->", dst)


if __name__ == "__main__":
    main()
