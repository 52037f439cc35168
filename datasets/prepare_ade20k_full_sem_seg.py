#!/usr/bin/env python3
"""Prepare ADE20k-full (847 classes) semantic-segmentation data.

Reference behavior: /root/reference/datasets/prepare_ade20k_full_sem_seg.py
:932-1007 — walk `index_ade20k.pkl`, decode each `*_seg.png` into object class
ids (class = 256*round(R/10) + G), downscale images so the short side is at
most 512 (bilinear for the image, nearest for labels), remap dataset class ids
to train ids via the 847-category table, and save images plus uint16 label
TIFFs (65535 = ignore) under images_detectron2/ and annotations_detectron2/.

The 847-entry {name, id, trainId} table is data, stored here as
datasets/assets/ade20k_full_categories.json (extracted from the reference's
inline ADE20K_SEM_SEG_FULL_CATEGORIES list, :13-930).
"""

import argparse
import json
import os
import pickle

import numpy as np
from PIL import Image


def load_ade20k_class_mask(seg_png: str) -> np.ndarray:
    seg = np.asarray(Image.open(seg_png))
    r = (seg[:, :, 0] / 10).astype(np.int32)
    g = seg[:, :, 1].astype(np.int32)
    return r * 256 + g


def resize_short_cap(img: np.ndarray, lab: np.ndarray, max_size=512):
    """Cap the SHORT side at max_size, preserving aspect (reference :972-985)."""
    h, w = img.shape[:2]
    if w >= h > max_size:
        hn, wn = max_size, round(w / float(h) * max_size)
    elif h >= w > max_size:
        hn, wn = round(h / float(w) * max_size), max_size
    else:
        return img, lab
    import cv2

    img = cv2.resize(img, (wn, hn), interpolation=cv2.INTER_LINEAR)
    lab = cv2.resize(lab, (wn, hn), interpolation=cv2.INTER_NEAREST)
    return img, lab


def convert_one(img_path, out_img, out_lab, id_map, max_size=512):
    lab = load_ade20k_class_mask(img_path.replace(".jpg", "_seg.png"))
    img = np.asarray(Image.open(img_path))
    img, lab = resize_short_cap(img, lab, max_size)
    out = np.full(lab.shape, 65535, np.uint16)
    for obj_id in np.unique(lab):
        if int(obj_id) in id_map:
            out[lab == obj_id] = id_map[int(obj_id)]
    Image.fromarray(img).save(out_img)
    Image.fromarray(out).save(out_lab)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.getenv("DETECTRON2_DATASETS", "datasets"))
    args = ap.parse_args()
    base = os.path.join(args.root, "ADE20K_2021_17_01")
    with open(os.path.join(base, "index_ade20k.pkl"), "rb") as f:
        index = pickle.load(f)
    cats = json.load(
        open(os.path.join(os.path.dirname(__file__), "assets/ade20k_full_categories.json"))
    )
    id_map = {c["id"]: c["trainId"] for c in cats}

    for split in ("training", "validation"):
        os.makedirs(os.path.join(base, "images_detectron2", split), exist_ok=True)
        os.makedirs(os.path.join(base, "annotations_detectron2", split), exist_ok=True)

    n = 0
    for folder, fname in zip(index["folder"], index["filename"]):
        split = "validation" if fname.split("_")[1] == "val" else "training"
        convert_one(
            os.path.join(args.root, folder, fname),
            os.path.join(base, "images_detectron2", split, fname),
            os.path.join(base, "annotations_detectron2", split, fname.replace(".jpg", ".tif")),
            id_map,
        )
        n += 1
    print(f"converted {n} images")


if __name__ == "__main__":
    main()
