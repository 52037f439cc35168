#!/usr/bin/env python3
"""Shard a monolithic COCO json into per-image sidecar jsons (SA-1B layout).

Reference behavior: /root/reference/datasets/tools/generate_img_ann_pair.py —
for every image with annotations, write `{"image": <img>, "annotations":
[...]}` next to the image file (same basename, .json). If a sidecar already
exists (e.g. SA-1B's own per-image json with a "key" field), merge into it,
keeping existing fields and asserting key == zero-padded image id.
"""

import argparse
import json
import os
from collections import defaultdict


def shard(json_data, image_root):
    image_id_to_ann = defaultdict(list)
    for ann in json_data["annotations"]:
        image_id_to_ann[ann["image_id"]].append(ann)
    image_id_to_img = {img["id"]: img for img in json_data["images"]}

    written = 0
    for image_id, anns in image_id_to_ann.items():
        img = image_id_to_img[image_id]
        out_data = {"image": img, "annotations": anns}
        path = os.path.join(image_root, img["file_name"])
        ext = path.split(".")[-1]
        path = path[: -len(ext)] + "json"
        if os.path.isfile(path):
            try:
                existing = json.load(open(path))
                if "key" in existing:
                    assert existing["key"] == str(img["id"]).zfill(9)
                existing.update(out_data)
                out_data = existing
            except Exception as e:
                print(path, e)
        with open(path, "w") as f:
            json.dump(out_data, f, indent=4)
        written += 1
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_path", required=True)
    ap.add_argument("--image_root", required=True)
    args = ap.parse_args()
    data = json.load(open(args.json_path))
    print("wrote", shard(data, args.image_root), "sidecar jsons")


if __name__ == "__main__":
    main()
