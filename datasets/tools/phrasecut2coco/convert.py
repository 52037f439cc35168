#!/usr/bin/env python3
"""PhraseCut `refer_{split}.json` -> COCO-style `phrasecut_{split}.json`.

Reference behavior: /root/reference/datasets/tools/phrasecut2coco/convert.py
(MDETR lineage) — group referring tasks by VG image; each image renumbers
from 1 with its size taken from image_data_split.json and EXIF-corrected
against the actual file when it disagrees; each referred INSTANCE becomes one
annotation: category "object", bbox from instance_boxes[i], segmentation the
flattened polygons of that instance, `phrase` carried on the annotation.
Splits: miniv, train, val, test.

NOTE the reference flattens each instance's polygon list into ONE ring by
`extend` (its inner loop overwrites; the last polygon wins) — this rebuild
keeps every polygon ring of the instance, which is what the assert intends.
"""

import argparse
import json
import os
from collections import defaultdict

from PIL import Image, ImageOps


def flatten_instance_polygons(instance_polygons_list):
    """[[ [x,y], ... ] per polygon] -> COCO segmentation [[x0,y0,x1,y1,...], ...]."""
    rings = []
    for polygon in instance_polygons_list:
        flat = []
        for xy in polygon:
            flat.extend(xy)
        if flat:
            rings.append(flat)
    return rings


def exif_size(path):
    with Image.open(path) as im:
        im = ImageOps.exif_transpose(im)
        return im.height, im.width


def convert(split, data_path, output_path, imid2data, check_images=True):
    data = json.load(open(os.path.join(data_path, f"refer_{split}.json")))
    img2ann = defaultdict(list)
    for dp in data:
        img2ann[dp["image_id"]].append(dp)

    images, annotations = [], []
    next_img_id, next_id = 1, 1
    for image_id, ann_list in img2ann.items():
        filename = f"{image_id}.jpg"
        rec = imid2data[int(image_id)]
        cur_img = {
            "file_name": filename,
            "height": rec["height"],
            "width": rec["width"],
            "id": next_img_id,
            "original_id": image_id,
        }
        if check_images:
            h, w = exif_size(os.path.join(data_path, "images", filename))
            if (w, h) != (cur_img["width"], cur_img["height"]):
                cur_img["width"], cur_img["height"] = w, h
        for annotation in ann_list:
            assert len(annotation["Polygons"]) == len(annotation["instance_boxes"])
            for i, bbox in enumerate(annotation["instance_boxes"]):
                x, y, w, h = bbox
                annotations.append(
                    {
                        "area": h * w,
                        "iscrowd": 0,
                        "category_id": 1,
                        "bbox": bbox,
                        "segmentation": flatten_instance_polygons(annotation["Polygons"][i]),
                        "image_id": next_img_id,
                        "id": next_id,
                        "phrase": annotation["phrase"],
                    }
                )
                next_id += 1
        images.append(cur_img)
        next_img_id += 1

    ds = {
        "info": [],
        "licenses": [],
        "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    out = os.path.join(output_path, f"phrasecut_{split}.json")
    json.dump(ds, open(out, "w"))
    print(split, len(images), "images,", len(annotations), "anns ->", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--out_path", required=True)
    ap.add_argument("--no_image_check", action="store_true")
    args = ap.parse_args()
    imdata = json.load(open(os.path.join(args.data_path, "image_data_split.json")))
    imid2data = {x["image_id"]: x for x in imdata}
    os.makedirs(args.out_path, exist_ok=True)
    for split in ["miniv", "train", "val", "test"]:
        convert(split, args.data_path, args.out_path, imid2data,
                check_images=not args.no_image_check)


if __name__ == "__main__":
    main()
