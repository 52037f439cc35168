#!/usr/bin/env python3
"""SeqTR-style RefCOCO/+/g `instances.json` -> per-split COCO jsons.

Reference behavior: /root/reference/datasets/tools/seqtr2coco/
convert_ref2coco.py — the SeqTR release stores {split: [records]} where each
record has image_id/height/width/bbox/mask/expressions. Each record becomes
ONE image (file_name COCO_train2014_%012d.jpg, `expressions` carried on the
image) paired with ONE annotation (category "object", id == image id,
globally increasing across splits), written to `<des>_<split>.json`.

Mask area comes from the segmentation (polygon shoelace or RLE sum) without
pycocotools/detectron2.
"""

import argparse
import json

import numpy as np


def polygon_area(poly):
    """Shoelace area of one flat [x0,y0,x1,y1,...] polygon."""
    xy = np.asarray(poly, np.float64).reshape(-1, 2)
    x, y = xy[:, 0], xy[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def segmentation_area(seg):
    if isinstance(seg, list):
        return sum(polygon_area(p) for p in seg)
    if isinstance(seg, dict):
        counts = seg["counts"]
        if isinstance(counts, list):  # uncompressed RLE: odd runs are fg
            return float(sum(counts[1::2]))
        from ape_tpu.data.transforms import rle_decode  # compressed RLE

        return float(rle_decode(seg).sum())
    raise TypeError(f"unknown segmentation type {type(seg)}")


def convert(data):
    """{split: [records]} -> {split: coco_dict}, ids increasing across splits."""
    out = {}
    inst_idx = 0
    for split, records in data.items():
        images, annos = [], []
        for rec in records:
            inst_idx += 1
            images.append(
                {
                    "file_name": "COCO_train2014_%012d.jpg" % rec["image_id"],
                    "height": rec["height"],
                    "width": rec["width"],
                    "id": inst_idx,
                    "expressions": rec["expressions"],
                }
            )
            annos.append(
                {
                    "bbox": rec["bbox"],
                    "segmentation": rec["mask"],
                    "image_id": inst_idx,
                    "iscrowd": 0,
                    "category_id": 1,
                    "id": inst_idx,
                    "area": segmentation_area(rec["mask"]),
                }
            )
        out[split] = {
            "images": images,
            "annotations": annos,
            "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_json", required=True)
    ap.add_argument("--des_json", required=True)
    args = ap.parse_args()
    data = json.load(open(args.src_json))
    for split, coco in convert(data).items():
        out = args.des_json.replace(".json", "_%s.json" % split)
        json.dump(coco, open(out, "w"))
        print(split, {k: len(v) for k, v in coco.items()}, "->", out)


if __name__ == "__main__":
    main()
