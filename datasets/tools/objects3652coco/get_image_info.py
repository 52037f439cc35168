#!/usr/bin/env python3
"""Scan images on disk and record their REAL (EXIF-corrected) sizes.

Reference behavior: /root/reference/datasets/tools/objects3652coco/
get_image_info.py — for every image in the json, open the file, apply EXIF
orientation, and append `image_id file_name height width channel` to the
output table (missing/truncated files are skipped). The table feeds
convert_annotations.py --apply_exif. Uses PIL (the reference used
detectron2.read_image, which is PIL + EXIF transpose + BGR).
"""

import argparse
import concurrent.futures
import json
import os

import numpy as np
from PIL import Image, ImageOps


def image_info(img_rec, image_dir):
    path = os.path.join(image_dir, img_rec["file_name"])
    if not os.path.isfile(path):
        return None
    try:
        with Image.open(path) as im:
            im = ImageOps.exif_transpose(im)
            arr = np.asarray(im.convert("RGB"))
    except Exception:
        return None
    h, w, c = arr.shape
    return f"{img_rec['id']} {img_rec['file_name']} {h} {w} {c}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--json_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--max_workers", type=int, default=16)
    args = ap.parse_args()
    images = json.load(open(args.json_path))["images"]
    n = 0
    with open(args.output_path, "w") as rec:
        with concurrent.futures.ThreadPoolExecutor(args.max_workers) as ex:
            for line in ex.map(lambda im: image_info(im, args.image_dir), images):
                if line is not None:
                    rec.write(line + "\n")
                    n += 1
    print(f"recorded {n}/{len(images)} images")


if __name__ == "__main__":
    main()
