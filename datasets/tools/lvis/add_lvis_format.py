#!/usr/bin/env python3
"""Stamp LVIS-required fields onto a plain COCO-style json.

Reference behavior: /root/reference/datasets/tools/lvis/add_lvis_format.py —
every image gets empty `neg_category_ids`/`not_exhaustive_category_ids` and
every category `frequency: "f"`, so LVIS-protocol consumers (federated loss,
LVIS evaluator) accept the file.
"""

import argparse
import json


def add_lvis_format(data):
    for im in data["images"]:
        im["neg_category_ids"] = []
        im["not_exhaustive_category_ids"] = []
    for c in data["categories"]:
        c["frequency"] = "f"
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_path", required=True)
    ap.add_argument("--out_path", default="")
    args = ap.parse_args()
    data = add_lvis_format(json.load(open(args.in_path)))
    if args.out_path:
        json.dump(data, open(args.out_path, "w"))
        print("wrote", args.out_path)


if __name__ == "__main__":
    main()
