#!/usr/bin/env python3
"""Prepare PASCAL VOC 2012 semantic val masks (VOC-20 protocol).

Reference behavior: /root/reference/datasets/prepare_voc_sem_seg.py —
SegmentationClassAug masks carry class ids 0 (background) .. 20 plus 255
(ignore); the output shifts classes to train ids 0..19, sends background and
ignore to 255, skips masks that end up all-ignore, and writes PNGs under
annotations_detectron2/val.
"""

import argparse
import os

import numpy as np
from PIL import Image


def remap_voc_mask(mask: np.ndarray) -> np.ndarray:
    out = np.full(mask.shape, 255, np.uint8)
    for cls in range(1, 21):
        out[mask == cls] = cls - 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.getenv("DETECTRON2_DATASETS", "datasets"))
    ap.add_argument("--splits", nargs="*", default=["val"])
    args = ap.parse_args()
    voc = os.path.join(args.root, "VOCdevkit", "VOC2012")
    out_dir = os.path.join(voc, "annotations_detectron2")

    for split in args.splits:
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        ids = [
            s.strip()
            for s in open(os.path.join(voc, "ImageSets/Segmentation", split + ".txt"))
            if s.strip()
        ]
        n = 0
        for fileid in ids:
            src = os.path.join(voc, "SegmentationClassAug", fileid + ".png")
            mask = remap_voc_mask(np.asarray(Image.open(src)))
            if (mask == 255).all():
                continue  # nothing but ignore: the reference drops these
            Image.fromarray(mask).save(os.path.join(out_dir, split, fileid + ".png"))
            n += 1
        print(f"{split}: wrote {n} masks")


if __name__ == "__main__":
    main()
