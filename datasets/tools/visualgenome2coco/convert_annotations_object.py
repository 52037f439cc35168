#!/usr/bin/env python3
"""Visual Genome objects.json -> COCO-style box jsons
(`visualgenome_{C}_box{_train,_val,}.json` + a categories side file).

Reference behavior: /root/reference/datasets/tools/visualgenome2coco/
convert_annotations_object.py (bottom-up-attention lineage):

  * Labels lowercase + punctuation-stripped (with a small unicode replacement
    table), then folded through a TRANSITIVELY-merged alias union of
    object_alias.txt and the 1600-vocab file; a merged group's canonical name
    is the comma-join of all its aliases.
  * Boxes below min_box_area_frac of the image area drop.
  * The kept vocabulary is the top `num_objects` most-frequent merged tokens
    that intersect object_list (VG/150/object_list.txt by default); an
    optional exclude list removes groups intersecting it.
  * Category ids are 1-based over the SORTED kept vocabulary; the written
    category/phrase name is the group's first alias.
  * Images keep only those with >=1 surviving object; file_name is the last
    two URL path segments; optional EXIF size correction.
  * Splits: train = first max(0.7*N, N-5000) images, val = the rest.

The VG/ vocab text files are data, copied verbatim from the reference.
"""

import argparse
import json
import os
import string
from collections import Counter

REPLACEMENTS = {
    "½": "half", "—": "-", "™": "", "¢": "cent",
    "ç": "c", "û": "u", "é": "e", "°": " degree",
    "è": "e", "…": "",
}


def sentence_preprocess(phrase):
    phrase = phrase.strip(" ")
    for k, v in REPLACEMENTS.items():
        phrase = phrase.replace(k, v)
    return str(phrase).lower().translate(str.maketrans("", "", string.punctuation))


def read_alias_lines(path):
    return [
        [a.strip("\n").strip("\r") for a in line.strip("\n").strip("\r").split(",")]
        for line in open(path)
    ]


def make_alias_dict_new(*alias_files):
    """Transitively union alias groups; each alias -> comma-joined group."""
    alias_list = []
    for f in alias_files:
        alias_list.extend(read_alias_lines(f))
    merged = []
    consumed = set()
    for i, a in enumerate(alias_list):
        if i in consumed:
            continue
        consumed.add(i)
        a = list(a)
        a_set = set(a)
        if len(a) <= 1:
            continue
        changed = True
        while changed:
            changed = False
            for j, b in enumerate(alias_list):
                if j in consumed:
                    continue
                if not a_set.isdisjoint(b):
                    a.extend(b)
                    a_set = set(a)
                    consumed.add(j)
                    changed = True
        if len(a) > 1:
            merged.append(a)
    out = {}
    for group in merged:
        name = ",".join(group)
        for alias in group:
            out[alias] = name
    return out


def make_list(path):
    return [
        x.strip("\n").strip("\r")
        for line in open(path)
        for x in line.strip("\n").strip("\r").split(",")
    ]


def preprocess_object_labels(object_data, alias_dict):
    for img in object_data:
        for obj in img["objects"]:
            names = []
            for name in obj["names"]:
                label = sentence_preprocess(name.lower())
                names.append(alias_dict.get(label, label))
            obj["names"] = names


def filter_object_boxes(object_data, image_data, area_frac_thresh):
    kept = total = 0
    for img, meta in zip(object_data, image_data):
        area = float(meta["height"] * meta["width"])
        keep = []
        for obj in img["objects"]:
            total += 1
            if float(obj["h"] * obj["w"]) > area * area_frac_thresh:
                keep.append(obj)
                kept += 1
        img["objects"] = keep
    return kept, total


def extract_object_token(object_data, num_tokens, object_list=()):
    counter = Counter()
    olist = {x.lower() for x in object_list}
    for img in object_data:
        for obj in img["objects"]:
            for name in obj["names"]:
                if not name:
                    continue
                if not olist or not {x.lower() for x in name.split(",")}.isdisjoint(olist):
                    counter.update([name])
    tokens = set()
    counts = {}
    for token, count in counter.most_common():
        tokens.add(token)
        counts[token] = count
        if len(tokens) == num_tokens:
            break
    return tokens, counts


def build_token_dict(vocab):
    token_to_idx = {t: i for i, t in enumerate(sorted(vocab), 1)}
    return token_to_idx, {i: t for t, i in token_to_idx.items()}


def first_alias(name):
    return name.split(",")[0].strip("\n").strip("\r").strip()


def convert(object_data, image_data, num_objects=150, object_list=(),
            exclude_list=(), min_box_area_frac=0.002):
    """-> (train_dict, val_dict, all_dict, categories)."""
    assert len(object_data) == len(image_data)
    if min_box_area_frac > 0:
        filter_object_boxes(object_data, image_data, min_box_area_frac)
    tokens, _counts = extract_object_token(object_data, num_objects, object_list)
    label_to_idx, idx_to_label = build_token_dict(tokens)
    exclude_tokens = {
        t for t in tokens
        if exclude_list and not {x.lower() for x in t.split(",")}.isdisjoint(
            {x.lower() for x in exclude_list}
        )
    }

    def kept(obj):
        name = obj["names"][0]
        return name in tokens and name not in exclude_tokens

    images = []
    for meta, objs in zip(image_data, object_data):
        if not any(kept(o) for o in objs["objects"]):
            continue
        parts = os.path.normpath(meta["url"]).split(os.sep)
        images.append(
            {
                "id": meta["image_id"],
                "file_name": os.path.join(parts[-2], parts[-1]),
                "height": meta["height"],
                "width": meta["width"],
            }
        )
    n_train = max(int(len(images) * 0.7), len(images) - 5000)
    train_ids = {im["id"] for im in images[:n_train]}
    all_ids = {im["id"] for im in images}

    anns, anns_train, anns_val = [], [], []
    ann_id = 1
    for meta, objs in zip(image_data, object_data):
        image_id = meta["image_id"]
        if image_id not in all_ids:
            continue
        for obj in objs["objects"]:
            if not kept(obj):
                continue
            name = obj["names"][0]
            ann = {
                "id": ann_id,
                "image_id": image_id,
                "category_id": label_to_idx[name],
                "phrase": first_alias(name),
                "isobject": 1,
                "bbox": [obj["x"], obj["y"], obj["w"], obj["h"]],
                "area": obj["h"] * obj["w"],
                "iscrowd": False,
            }
            ann_id += 1
            anns.append(ann)
            (anns_train if image_id in train_ids else anns_val).append(ann)

    categories = [
        {"id": i, "name": first_alias(name)} for i, name in idx_to_label.items()
    ]

    def ds(imgs, annotations):
        return {
            "info": {}, "licenses": [], "categories": categories,
            "images": imgs, "annotations": annotations,
        }

    return (
        ds(images[:n_train], anns_train),
        ds(images[n_train:], anns_val),
        ds(images, anns),
        categories,
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
    train, val, full, categories = convert(
        object_data, image_data, args.num_objects, object_list, exclude,
        args.min_box_area_frac,
    )
    c = len(categories)
    tag = f"{c}minus{len(exclude)}" if exclude else f"{c}"
    for suffix, data in (("_train", train), ("_val", val), ("", full)):
        out = os.path.join(ann_dir, f"visualgenome_{tag}_box{suffix}.json")
        json.dump(data, open(out, "w"))
        print(len(data["images"]), "images,", len(data["annotations"]), "anns ->", out)
    json.dump(
        categories,
        open(os.path.join(ann_dir, f"visualgenome_{tag}_box_categories.json"), "w"),
    )


if __name__ == "__main__":
    main()
