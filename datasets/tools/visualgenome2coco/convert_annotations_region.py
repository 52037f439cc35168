#!/usr/bin/env python3
"""Visual Genome objects + region descriptions -> COCO-style grounding jsons
(`visualgenome_{C}_box_and_region{_train,_val,}.json` + region-only
`visualgenome_region{_train,_val,}.json` + categories side file).

Reference behavior: /root/reference/datasets/tools/visualgenome2coco/
convert_annotations_region.py — identical object pipeline to
convert_annotations_object.py (alias merge, area filter, vocab top-N,
70%/last-5000 split over images that kept >=1 object), PLUS one annotation
per region description: phrase = the region's text, `isobject` 0, bbox xywh,
and category_id = len(vocab) + region index within the image (the reference's
scheme — region "categories" are synthetic). Region annotations go to both
the box_and_region files and the region-only files.
"""

import argparse
import json
import os

from convert_annotations_object import (  # noqa: E402 (same dir)
    convert as convert_objects,
    make_alias_dict_new,
    make_list,
    preprocess_object_labels,
)


def add_regions(ds_train, ds_val, ds_full, region_data, image_data, n_categories):
    """Append region annotations; returns the three region-only datasets."""
    next_id = max((a["id"] for a in ds_full["annotations"]), default=0) + 1
    train_ids = {im["id"] for im in ds_train["images"]}
    val_ids = {im["id"] for im in ds_val["images"]}
    region_train, region_val, region_all = [], [], []
    by_id = {r["id"]: r for r in region_data}
    for meta in image_data:
        image_id = meta["image_id"]
        if image_id not in train_ids and image_id not in val_ids:
            continue
        rec = by_id.get(image_id)
        if rec is None:
            continue
        for reg_id, reg in enumerate(rec["regions"]):
            assert reg["image_id"] == image_id
            ann = {
                "id": next_id,
                "image_id": image_id,
                "category_id": n_categories + reg_id,
                "phrase": reg["phrase"],
                "isobject": 0,
                "bbox": [reg["x"], reg["y"], reg["width"], reg["height"]],
                "area": reg["height"] * reg["width"],
                "iscrowd": False,
            }
            next_id += 1
            ds_full["annotations"].append(ann)
            region_all.append(ann)
            if image_id in train_ids:
                ds_train["annotations"].append(ann)
                region_train.append(ann)
            else:
                ds_val["annotations"].append(ann)
                region_val.append(ann)

    def region_ds(src_ds, annotations):
        return {
            "info": {}, "licenses": [], "categories": src_ds["categories"],
            "images": src_ds["images"], "annotations": annotations,
        }

    return (
        region_ds(ds_train, region_train),
        region_ds(ds_val, region_val),
        region_ds(ds_full, region_all),
    )


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--path", required=True, help="VG root")
    ap.add_argument("--num_objects", type=int, default=150)
    ap.add_argument("--object_list_path", default=os.path.join(here, "VG/150/object_list.txt"))
    ap.add_argument("--exclude_object_list_path", default="")
    ap.add_argument("--min_box_area_frac", type=float, default=0.002)
    args = ap.parse_args()
    ann_dir = os.path.join(args.path, "annotations")
    object_data = json.load(open(os.path.join(ann_dir, "objects.json")))
    image_data = json.load(open(os.path.join(ann_dir, "image_data.json")))
    region_data = json.load(open(os.path.join(ann_dir, "region_descriptions.json")))
    alias = make_alias_dict_new(
        os.path.join(ann_dir, "object_alias.txt"),
        os.path.join(here, "VG/1600-400-20/objects_vocab.txt"),
    )
    preprocess_object_labels(object_data, alias)
    object_list = make_list(args.object_list_path) if args.object_list_path else ()
    exclude = (
        make_list(args.exclude_object_list_path)
        if args.exclude_object_list_path
        else ()
    )
    train, val, full, categories = convert_objects(
        object_data, image_data, args.num_objects, object_list, exclude,
        args.min_box_area_frac,
    )
    r_train, r_val, r_all = add_regions(
        train, val, full, region_data, image_data, len(categories)
    )
    c = len(categories)
    tag = f"{c}minus{len(exclude)}" if exclude else f"{c}"
    outputs = [
        (f"visualgenome_{tag}_box_and_region_train.json", train),
        (f"visualgenome_{tag}_box_and_region_val.json", val),
        (f"visualgenome_{tag}_box_and_region.json", full),
        ("visualgenome_region_train.json", r_train),
        ("visualgenome_region_val.json", r_val),
        ("visualgenome_region.json", r_all),
    ]
    for name, data in outputs:
        out = os.path.join(ann_dir, name)
        json.dump(data, open(out, "w"))
        print(len(data["images"]), "images,", len(data["annotations"]), "anns ->", out)
    json.dump(
        categories,
        open(os.path.join(ann_dir, f"visualgenome_{tag}_box_and_region_categories.json"), "w"),
    )


if __name__ == "__main__":
    main()
