#!/usr/bin/env python3
"""Add per-category image/instance counts (and LVIS frequency buckets) to a
COCO/LVIS-style json, in place, plus a `*_cat_info.json` side file.

Reference behavior: /root/reference/datasets/tools/lvis/
add_category_info_frequence.py — image_count = #distinct images with the
category, instance_count = #annotations; with --add_freq, frequency is
'r' below r_thresh images, 'c' below c_thresh, else 'f'.
"""

import argparse
import json


def add_category_info(json_data, add_freq=False, r_thresh=10, c_thresh=100):
    cats = [dict(c) for c in json_data["categories"]]
    image_count = {c["id"]: set() for c in cats}
    instance_count = {c["id"]: 0 for c in cats}
    for ann in json_data["annotations"]:
        cid = ann.get("category_id")
        if cid in image_count:
            image_count[cid].add(ann["image_id"])
            instance_count[cid] += 1
    for c in cats:
        c["image_count"] = len(image_count[c["id"]])
        c["instance_count"] = instance_count[c["id"]]
        if add_freq:
            freq = "f"
            if c["image_count"] < c_thresh:
                freq = "c"
            if c["image_count"] < r_thresh:
                freq = "r"
            c["frequency"] = freq
    return cats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_path", required=True)
    ap.add_argument("--add_freq", action="store_true")
    ap.add_argument("--r_thresh", type=int, default=10)
    ap.add_argument("--c_thresh", type=int, default=100)
    args = ap.parse_args()
    data = json.load(open(args.json_path))
    cats = add_category_info(data, args.add_freq, args.r_thresh, args.c_thresh)
    cat_info_path = args.json_path[:-5] + "_cat_info.json"
    json.dump(cats, open(cat_info_path, "w"))
    data["categories"] = cats
    json.dump(data, open(args.json_path, "w"))
    print("wrote", cat_info_path, "and updated", args.json_path)


if __name__ == "__main__":
    main()
