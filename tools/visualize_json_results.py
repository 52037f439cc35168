#!/usr/bin/env python
"""Plot saved prediction json over images.

Capability match: /root/reference/tools/visualize_json_results.py — read a
predictions json (as written by demo_lazy.py / evaluators) and render overlays.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image, ImageDraw


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="predictions json")
    p.add_argument("--image-root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--conf-threshold", type=float, default=0.3)
    args = p.parse_args()

    with open(args.input) as f:
        preds = json.load(f)
    by_img = {}
    for pr in preds:
        by_img.setdefault(str(pr["image_id"]), []).append(pr)

    os.makedirs(args.output, exist_ok=True)
    for img_id, prs in by_img.items():
        path = os.path.join(args.image_root, img_id)
        if not os.path.exists(path):
            continue
        img = Image.open(path).convert("RGB")
        draw = ImageDraw.Draw(img)
        for pr in prs:
            if pr["score"] < args.conf_threshold:
                continue
            x, y, w, h = pr["bbox"]
            draw.rectangle([x, y, x + w, y + h], outline=(255, 40, 40), width=3)
            label = pr.get("category_name", str(pr["category_id"]))
            draw.text((x + 2, max(y - 12, 0)), f"{label} {pr['score']:.2f}", fill=(255, 40, 40))
        img.save(os.path.join(args.output, os.path.basename(img_id)))


if __name__ == "__main__":
    main()
