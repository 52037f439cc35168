#!/usr/bin/env python3
"""Build `refcoco-mixed/instances_cocofied_train.json` — the concatenated
train splits of refcoco-unc + refcocog-umd + refcocoplus-unc.

Reference behavior: /root/reference/datasets/tools/seqtr2coco/
convert_mix_ref.py — first cocofy each dataset (convert_ref2coco), then
append every (image, annotation) pair of the three train jsons with fresh
contiguous ids (one image per referred object, as in the per-dataset files).
"""

import argparse
import json
import os
import subprocess
import sys

DATASETS = ["refcoco-unc", "refcocog-umd", "refcocoplus-unc"]


def merge_trains(datas):
    out = {
        "images": [],
        "annotations": [],
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    inst_idx = 0
    for data in datas:
        for img, ann in zip(data["images"], data["annotations"]):
            inst_idx += 1
            img = dict(img, id=inst_idx)
            ann = dict(ann, image_id=inst_idx, id=inst_idx)
            out["images"].append(img)
            out["annotations"].append(ann)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/SeqTR")
    ap.add_argument(
        "--skip_cocofy", action="store_true",
        help="assume instances_cocofied_train.json already exist",
    )
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    if not args.skip_cocofy:
        for ds in DATASETS + ["refcocog-google"]:
            subprocess.check_call(
                [
                    sys.executable, os.path.join(here, "convert_ref2coco.py"),
                    "--src_json", os.path.join(args.root, ds, "instances.json"),
                    "--des_json", os.path.join(args.root, ds, "instances_cocofied.json"),
                ]
            )
    datas = [
        json.load(open(os.path.join(args.root, ds, "instances_cocofied_train.json")))
        for ds in DATASETS
    ]
    merged = merge_trains(datas)
    out_dir = os.path.join(args.root, "refcoco-mixed")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "instances_cocofied_train.json")
    json.dump(merged, open(out, "w"))
    print({k: len(v) for k, v in merged.items()}, "->", out)


if __name__ == "__main__":
    main()
