#!/usr/bin/env python3
"""Objects365 v2 `zhiyuan_objv2_{split}.json` -> `objects365_{split}.json`.

Reference behavior: /root/reference/datasets/tools/objects3652coco/
convert_annotations.py — mostly a passthrough of licenses/categories/images/
annotations with:

  * `minival` = the first 5000 val images (annotations filtered to them);
  * optional EXIF correction from a sidecar table of
    `image_id file_name height width channel` lines (images missing from the
    table drop, together with their annotations; stored h/w replaced by the
    EXIF-corrected values).
"""

import argparse
import json
import os


def load_image_info(path):
    info = {}
    for line in open(path):
        parts = line.strip().split()
        if not parts:
            continue
        image_id, file_name, height, width, _channel = parts
        info[int(image_id)] = (file_name, int(height), int(width))
    return info


def convert(json_data, subset, image_info=None):
    images = json_data["images"]
    if subset == "minival":
        images = images[:5000]
    removed = set()
    if image_info is not None:
        kept = []
        for img in images:
            if img["id"] not in image_info:
                removed.add(img["id"])
                continue
            file_name, height, width = image_info[img["id"]]
            assert file_name == img["file_name"], (file_name, img["file_name"])
            if (width, height) != (img["width"], img["height"]):
                img = dict(img, width=width, height=height)
            kept.append(img)
        images = kept

    anns = [a for a in json_data["annotations"] if a["image_id"] not in removed]
    if subset == "minival":
        keep = {im["id"] for im in images}
        anns = [a for a in anns if a["image_id"] in keep]

    return {
        "licenses": json_data.get("licenses", []),
        "categories": json_data["categories"],
        "images": images,
        "annotations": anns,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--apply_exif", action="store_true")
    ap.add_argument("--image_info_path", type=str, default=None)
    ap.add_argument(
        "--subsets", nargs="+", default=["val", "train"],
        choices=["train", "val", "minival"],
    )
    args = ap.parse_args()
    image_info = (
        load_image_info(args.image_info_path) if args.apply_exif else None
    )
    for subset in args.subsets:
        src_name = "zhiyuan_objv2_val.json" if subset in ("val", "minival") else "zhiyuan_objv2_train.json"
        data = json.load(open(os.path.join(args.root_dir, "annotations", src_name)))
        out = convert(data, subset, image_info)
        dst = os.path.join(args.root_dir, "annotations", f"objects365_{subset}.json")
        json.dump(out, open(dst, "w"))
        print(subset, len(out["images"]), "images,", len(out["annotations"]), "anns ->", dst)


if __name__ == "__main__":
    main()
