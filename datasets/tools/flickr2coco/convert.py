#!/usr/bin/env python3
"""Flickr30k Entities -> COCO-style grounding jsons
(`flickr30k_{separateGT|mergedGT}_{split}.json`).

Reference behavior: /root/reference/datasets/tools/flickr2coco/convert.py
(MDETR lineage):

  * Sentences/<id>.txt uses bracket notation
    `[/EN#<entity_id>/<types> the phrase words]`; the parser recovers the
    plain sentence plus each phrase's text/first-word-index/entity id.
  * Annotations/<id>.xml gives one or more boxes per entity id (a box element
    can carry several <name> entity ids).
  * --merge_ground_truth replaces each entity's boxes by their enclosing
    union box (Plummer protocol); otherwise boxes stay separate.
  * Per sentence, all boxes of its entities are clustered by IoU >= 0.95
    union-find; each cluster emits ONE annotation (the cluster's last box)
    whose `phrase` concatenates every phrase span referring to any entity in
    the cluster. Image sizes are EXIF-checked against the actual file.

Rebuilt on xml.etree + numpy only (no xmltodict/torch/detectron2).
"""

import argparse
import json
import os
from collections import defaultdict
from xml.etree.ElementTree import parse as xml_parse

import numpy as np


def get_sentence_data(filename):
    """Parse a Flickr30k Entities sentence file (bracket notation)."""
    annotations = []
    for sentence in open(filename).read().split("\n"):
        if not sentence:
            continue
        words = []
        phrases = []
        current = None  # (first_word_index, entity_id, types, tokens)
        for token in sentence.split():
            if current is not None:
                closing = token.endswith("]")
                tok = token[:-1] if closing else token
                current[3].append(tok)
                words.append(tok)
                if closing:
                    phrases.append(
                        {
                            "first_word_index": current[0],
                            "phrase": " ".join(current[3]),
                            "phrase_id": current[1],
                            "phrase_type": current[2],
                        }
                    )
                    current = None
            elif token.startswith("["):
                parts = token.split("/")
                current = (len(words), parts[1][3:], parts[2:], [])
            else:
                words.append(token)
        annotations.append({"sentence": " ".join(words), "phrases": phrases})
    return annotations


def parse_boxes_xml(anno_file):
    """Annotations/<id>.xml -> (file_name, (h, w), {entity_id: [xywh boxes]})."""
    root = xml_parse(anno_file).getroot()
    file_name = root.findtext("./filename")
    size = (int(root.findtext("./size/height")), int(root.findtext("./size/width")))
    target_bboxes = defaultdict(list)
    for elem in root.findall("./object"):
        bnd = elem.find("bndbox")
        if bnd is None or len(bnd) == 0:
            continue
        xmin = float(elem.findtext("./bndbox/xmin"))
        ymin = float(elem.findtext("./bndbox/ymin"))
        xmax = float(elem.findtext("./bndbox/xmax"))
        ymax = float(elem.findtext("./bndbox/ymax"))
        box = [xmin, ymin, xmax - xmin, ymax - ymin]
        for name in elem.findall("name"):
            target_bboxes[int(name.text)].append(box)
    return file_name, size, dict(target_bboxes)


def merge_entity_boxes(target_bboxes):
    """Plummer merged-GT: each entity's boxes -> one enclosing box."""
    out = {}
    for eid, boxes in target_bboxes.items():
        b = np.asarray(boxes, np.float64)
        x0, y0 = b[:, 0].min(), b[:, 1].min()
        x1 = (b[:, 0] + b[:, 2]).max()
        y1 = (b[:, 1] + b[:, 3]).max()
        out[eid] = [[x0, y0, x1 - x0, y1 - y0]]
    return out


class UnionFind:
    def __init__(self, n):
        self.parent = list(range(n))

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def unite(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def get_equivalent_boxes(all_boxes, iou_threshold=0.95):
    """Cluster xywh boxes by IoU >= threshold; {root: [indices]}."""
    if len(all_boxes) == 0:
        return {0: []}
    b = np.asarray(all_boxes, np.float64)
    x0, y0 = b[:, 0], b[:, 1]
    x1, y1 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.maximum(
        0, np.minimum(x1[:, None], x1[None]) - np.maximum(x0[:, None], x0[None])
    )
    iy = np.maximum(
        0, np.minimum(y1[:, None], y1[None]) - np.maximum(y0[:, None], y0[None])
    )
    inter = ix * iy
    area = b[:, 2] * b[:, 3]
    union = area[:, None] + area[None] - inter
    iou = np.where(union > 0, inter / union, 0.0)
    uf = UnionFind(len(all_boxes))
    for i, j in zip(*np.where(iou >= iou_threshold)):
        uf.unite(int(i), int(j))
    compo = defaultdict(list)
    for i in range(len(all_boxes)):
        compo[uf.find(i)].append(i)
    return dict(compo)


def phrase_spans(sentence, phrases):
    """Character span of each phrase (via first_word_index); asserts exact."""
    spans = {}
    for gpid, phrase in enumerate(phrases):
        first_word = phrase["first_word_index"]
        beg = sum(len(w) for w in sentence.split()[:first_word]) + first_word
        spans[gpid] = (beg, beg + len(phrase["phrase"]))
        assert sentence[beg : beg + len(phrase["phrase"])] == phrase["phrase"]
    return spans


def sentence_annotations(sents, target_bboxes, image_id, next_id):
    """All grounding annotations of one image (across its sentences)."""
    annotations = []
    for sent in sents:
        sentence = sent["sentence"]
        spans = phrase_spans(sentence, sent["phrases"])
        ent2pids = defaultdict(list)
        for gpid, phrase in enumerate(sent["phrases"]):
            ent2pids[int(phrase["phrase_id"])].append(gpid)

        boxes = []
        for phrase in sent["phrases"]:
            eid = int(phrase["phrase_id"])
            if eid in target_bboxes and not any(b["ent_id"] == eid for b in boxes):
                for bb in target_bboxes[eid]:
                    boxes.append({"ent_id": eid, "coords": bb})
        for equiv in get_equivalent_boxes([b["coords"] for b in boxes], 0.95).values():
            if not equiv:
                continue
            ent_ids = {boxes[i]["ent_id"] for i in equiv}
            token_spans = []
            for eid in sorted(ent_ids):
                token_spans += [spans[g] for g in ent2pids[eid]]
            xmin, ymin, w, h = boxes[equiv[-1]]["coords"]
            annotations.append(
                {
                    "area": h * w,
                    "iscrowd": 0,
                    "image_id": image_id,
                    "category_id": 1,
                    "id": next_id,
                    "bbox": [xmin, ymin, w, h],
                    "phrase": " ".join(sentence[s0:s1] for s0, s1 in token_spans),
                }
            )
            next_id += 1
    return annotations, next_id


def convert(subset, flickr_path, output_path, merge_ground_truth,
            next_img_id=1, next_id=1, check_images=True):
    ids = [int(l.strip()) for l in open(os.path.join(flickr_path, f"{subset}.txt"))]
    images, annotations = [], []
    for img_id in ids:
        file_name, (h, w), target_bboxes = parse_boxes_xml(
            os.path.join(flickr_path, "Annotations", f"{img_id}.xml")
        )
        cur_img = {
            "file_name": file_name, "height": h, "width": w,
            "id": next_img_id, "original_img_id": img_id,
        }
        if check_images:
            from PIL import Image, ImageOps

            with Image.open(
                os.path.join(output_path, "flickr30k-images", file_name)
            ) as im:
                im = ImageOps.exif_transpose(im)
                if (im.width, im.height) != (w, h):
                    cur_img["width"], cur_img["height"] = im.width, im.height
        if merge_ground_truth:
            target_bboxes = merge_entity_boxes(target_bboxes)
        sents = get_sentence_data(
            os.path.join(flickr_path, "Sentences", f"{img_id}.txt")
        )
        annos, next_id = sentence_annotations(
            sents, target_bboxes, next_img_id, next_id
        )
        annotations += annos
        images.append(cur_img)
        next_img_id += 1

    tag = "mergedGT" if merge_ground_truth else "separateGT"
    ds = {
        "info": [], "licenses": [], "images": images,
        "annotations": annotations,
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    out = os.path.join(output_path, f"flickr30k_{tag}_{subset}.json")
    json.dump(ds, open(out, "w"))
    print(subset, len(images), "images,", len(annotations), "anns ->", out)
    return next_img_id, next_id


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flickr_path", required=True)
    ap.add_argument("--out_path", required=True)
    ap.add_argument("--merge_ground_truth", action="store_true")
    ap.add_argument("--no_image_check", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out_path, exist_ok=True)
    nim, nid = 1, 1
    for subset in ("train", "val", "test"):
        nim, nid = convert(
            subset, args.flickr_path, args.out_path, args.merge_ground_truth,
            nim, nid, check_images=not args.no_image_check,
        )


if __name__ == "__main__":
    main()
