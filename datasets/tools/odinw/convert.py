#!/usr/bin/env python3
"""Renumber ODinW `annotations_without_background.json` ids to contiguous
1-based ints -> `*_converted.json`.

Reference behavior: /root/reference/datasets/tools/odinw/convert.py — some
ODinW task jsons carry non-contiguous / non-int image ids; the converted file
renumbers images 1..N in order and remaps annotation image_ids, renumbering
annotation ids 1..M. The reference walks its MetadataCatalog for every odinw
json; this rebuild takes explicit paths (one or many).
"""

import argparse
import glob
import json
import os


def renumber(json_data):
    old_to_new = {}
    for i, img in enumerate(json_data["images"], 1):
        assert img["id"] not in old_to_new, f"duplicate image id {img['id']}"
        old_to_new[img["id"]] = i
        img["id"] = i
    for i, ann in enumerate(json_data["annotations"], 1):
        ann["image_id"] = old_to_new[ann["image_id"]]
        ann["id"] = i
    return json_data


def convert_file(json_file):
    if json_file.endswith("_converted.json"):
        src = json_file.replace("_converted.json", ".json")
        dst = json_file
    else:
        src = json_file
        dst = json_file.replace(".json", "_converted.json")
    with open(src) as f:
        data = renumber(json.load(f))
    with open(dst, "w") as f:
        json.dump(data, f, indent=4)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "paths", nargs="+",
        help="odinw annotation jsons (or glob patterns) to convert",
    )
    args = ap.parse_args()
    files = []
    for p in args.paths:
        files.extend(glob.glob(p) if any(c in p for c in "*?[") else [p])
    for f in files:
        print("->", convert_file(f))


if __name__ == "__main__":
    main()
