#!/usr/bin/env python3
"""Index SA-1B image folders into a COCO-style images-only json.

Reference behavior: /root/reference/datasets/tools/sa1b2coco/image+json.py —
walk the image root; for every image with a sibling per-image SA-1B json,
emit {file_name (root-relative), height, width, id} from that json's `image`
record. Single category "object" (id 1), no annotations (the SA-1B mapper
reads per-image mask jsons at load time). Every 1M images an intermediate
json `<out>_<N>.json` is checkpointed, matching the reference's split files
(sa1b_1m, 2m, ...).
"""

import argparse
import json
import os


def index_sa1b(image_root, checkpoint_every=1_000_000, on_checkpoint=None):
    imgs = []
    for root, _dirs, files in os.walk(image_root):
        for fname in sorted(files):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            path = os.path.join(root, fname)
            jpath = path[: -len(path.split(".")[-1])] + "json"
            if not os.path.isfile(jpath):
                continue
            try:
                meta = json.load(open(jpath))["image"]
            except Exception:
                continue
            imgs.append(
                {
                    "file_name": os.path.relpath(path, image_root),
                    "height": meta["height"],
                    "width": meta["width"],
                    "id": meta["image_id"],
                }
            )
            if on_checkpoint and len(imgs) % checkpoint_every == 0:
                on_checkpoint(imgs)
    return imgs


def to_coco(imgs):
    return {
        "categories": [{"id": 1, "name": "object"}],
        "images": imgs,
        "annotations": [],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--json_path", required=True, help="output path prefix (no .json)")
    args = ap.parse_args()

    def checkpoint(imgs):
        p = f"{args.json_path}_{len(imgs)}.json"
        json.dump(to_coco(imgs), open(p, "w"))
        print("checkpointed", p)

    imgs = index_sa1b(args.image_root, on_checkpoint=checkpoint)
    json.dump(to_coco(imgs), open(args.json_path + ".json", "w"))
    print("#imgs", len(imgs))


if __name__ == "__main__":
    main()
