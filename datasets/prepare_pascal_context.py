#!/usr/bin/env python3
"""Prepare Pascal Context 59/459 validation masks.

Reference behavior: /root/reference/datasets/prepare_pascal_context.py —
each trainval .mat holds a 'LabelMap' of 1-based PC459 class ids.
  * pc459: subtract 1, save as uint16 TIFF (annotations_detectron2/pc459_val).
  * pc59: map the 59 subset (names listed in 59_labels.txt, train id = line
    index) through labels.txt's name->459-id table; unmatched pixels 255;
    save uint8 PNG (annotations_detectron2/pc59_val).
"""

import argparse
import os

import numpy as np
import scipy.io
from PIL import Image


def parse_459_labels(text: str) -> dict:
    """labels.txt lines 'idx: name' -> {name: idx}."""
    out = {}
    for line in text.splitlines():
        if ":" in line:
            idx, name = line.split(":", 1)
            out[name.strip()] = int(idx.strip())
    return out


def parse_59_map(text_59: str, name_to_459: dict) -> dict:
    """59_labels.txt line i ('[i:] name') -> {trainId i: 459 id}."""
    out = {}
    for i, line in enumerate(text_59.splitlines()):
        name = line.split(":")[-1].strip()
        if name:
            out[i] = name_to_459[name]
    return out


def convert_pc459(label_map: np.ndarray) -> np.ndarray:
    out = label_map.astype(np.int32) - 1
    assert out.min() >= 0
    return out.astype(np.uint16)


def convert_pc59(label_map: np.ndarray, tr_to_459: dict) -> np.ndarray:
    out = np.full(label_map.shape, 255, np.uint8)
    for tr, cls459 in tr_to_459.items():
        out[label_map == cls459] = tr
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.getenv("DETECTRON2_DATASETS", "datasets"))
    args = ap.parse_args()
    pc = os.path.join(args.root, "VOCdevkit/VOC2010")
    name_to_459 = parse_459_labels(open(os.path.join(pc, "labels.txt")).read())
    tr_to_459 = parse_59_map(open(os.path.join(pc, "59_labels.txt")).read(), name_to_459)

    d459 = os.path.join(pc, "annotations_detectron2", "pc459_val")
    d59 = os.path.join(pc, "annotations_detectron2", "pc59_val")
    os.makedirs(d459, exist_ok=True)
    os.makedirs(d59, exist_ok=True)

    n = 0
    for line in open(os.path.join(pc, "pascalcontext_val.txt")):
        fileid = line.strip()
        mat = os.path.join(pc, "trainval", fileid + ".mat")
        if not os.path.exists(mat):
            continue
        label_map = scipy.io.loadmat(mat)["LabelMap"]
        Image.fromarray(convert_pc459(label_map)).save(
            os.path.join(d459, fileid + ".tif"), "TIFF"
        )
        Image.fromarray(convert_pc59(label_map, tr_to_459)).save(
            os.path.join(d59, fileid + ".png"), "PNG"
        )
        n += 1
    print(f"converted {n} masks (val only, like the reference)")


if __name__ == "__main__":
    main()
