#!/usr/bin/env python3
"""GQA balanced questions + scene graphs -> COCO-style grounding jsons
(`gqa_region_{train,val}.json` + combined `gqa_region.json`).

Reference behavior: /root/reference/datasets/tools/gqa2coco/convert.py (MDETR
lineage). Per question with grounded boxes:

  * Missing question groundings are patched from the program's `select`
    operations (`argument` = "name (id)") by locating the name in the
    question text, and What/Who/Where questions inherit answer-only boxes on
    the wh-token span.
  * A token reference is either a token index, a "a:b" token range, or a
    patched (beg, end) char span; all resolve to char spans, merged and
    word-snapped by consolidate_spans.
  * The annotation's `phrase` starts as the grounded question text and runs a
    cleanup chain: wh-words (and the truncated "wh"/"ho" forms) take the
    answer; the phrase upgrades to full_answer when it and the answer both
    appear in it and exactly one grounded phrase of the question does;
    he/she resolve to man/woman (or full_answer when it names one); 1-2 char
    phrases (except tv/cd) take full_answer; leading "yes, "/"no, " strips.
  * Each annotation carries question/answer/full_answer/tokens_positive/
    question_positive/phrase; category "object"; image sizes from VG
    image_data.json, EXIF-checked when images are available.
"""

import argparse
import json
import os
import re
from collections import defaultdict


def consolidate_spans(spans, caption):
    """Merge overlapping spans, snap to word boundaries, keep hyphenated words."""
    sorted_spans = sorted(spans)
    merged = []
    cur_beg, cur_end = None, -1
    for s in sorted_spans:
        if s[0] >= cur_end:
            if cur_beg is not None:
                merged.append((cur_beg, cur_end))
            cur_beg = s[0]
        cur_end = max(cur_end, s[1])
    if cur_beg is not None:
        merged.append((cur_beg, cur_end))

    clean = []
    for beg, end in merged:
        end = min(end, len(caption))
        while beg < len(caption) and not caption[beg].isalnum():
            beg += 1
        while end > 0 and not caption[end - 1].isalnum():
            end -= 1
        if end < len(caption) and caption[end] == "-":
            nxt = caption.find(" ", end)
            end = len(caption) if nxt == -1 else nxt + 1
        if beg > 0 and caption[beg - 1] == "-":
            prv = caption.rfind(" ", 0, beg)
            beg = 0 if prv == -1 else prv + 1
        if beg < end:
            clean.append((beg, end))
    return clean


_DIGITS = re.compile(r"([0-9]+)")
_WORDS = re.compile(r"([A-z]+)")
WH_TOKENS = ["What", "what", "Who", "who", "Where", "where"]


def patch_annotations(img2ann):
    """Reference's two grounding-recovery passes (select ops + answer boxes)."""
    for v in img2ann.values():
        for ann in v.values():
            expected = []
            for item in ann["semantic"]:
                if item["operation"] == "select" and _DIGITS.findall(item["argument"]):
                    expected.append(
                        (
                            _WORDS.findall(item["argument"])[0].strip(),
                            _DIGITS.findall(item["argument"])[0],
                        )
                    )
            qboxes = list(ann["annotations"]["question"].values())
            for name, box_id in expected:
                if box_id not in qboxes:
                    beg = ann["question"].find(name)
                    ann["annotations"]["question"][(beg, beg + len(name))] = box_id
    for v in img2ann.values():
        for ann in v.values():
            qobjs = list(ann["annotations"]["question"].values())
            aobjs = list(ann["annotations"]["answer"].values())
            if set(aobjs) - set(qobjs):
                for box_id in aobjs:
                    if box_id in qobjs:
                        continue
                    for tok in WH_TOKENS:
                        beg = ann["question"].find(tok)
                        if beg > -1:
                            ann["annotations"]["question"][(beg, beg + len(tok))] = box_id
                            break


def token_ref_to_span(text_tok_id, question):
    """Token index / 'a:b' range / literal (beg, end) -> char span."""
    if not isinstance(text_tok_id, str):
        return tuple(text_tok_id)
    if ":" in text_tok_id:
        a, b = text_tok_id.split(":")
        words = question.split()
        beg = sum(len(w) for w in words[: int(a)]) + int(a)
        end = sum(len(w) for w in words[: int(b) - 1]) + int(b) - 1
        end += len(words[int(b) - 1])
        return beg, end
    i = int(text_tok_id)
    words = question.split()
    beg = sum(len(w) for w in words[:i]) + i
    return beg, beg + len(words[i])


def clean_phrase(question_positive, answer, full_answer, n_phrases_in_full):
    phrase = question_positive
    if any(phrase.lower().startswith(p) for p in ("what", "who", "where")):
        phrase = answer
    elif question_positive.lower() in ("wh", "ho"):
        phrase = answer
    if n_phrases_in_full == 1 and answer in full_answer and phrase in full_answer:
        phrase = full_answer
    if phrase.lower() == "he":
        phrase = full_answer if any(
            w in full_answer for w in ("man", "boy", "guy")
        ) else "man"
    if phrase.lower() == "she":
        phrase = full_answer if any(
            w in full_answer for w in ("woman", "lady", "girl")
        ) else "woman"
    if len(phrase) == 2 and phrase.lower() not in ("tv", "cd"):
        phrase = full_answer
    if len(phrase) == 1:
        phrase = full_answer
    if phrase.lower().startswith("no, "):
        phrase = phrase[4:]
    if phrase.lower().startswith("yes, "):
        phrase = phrase[5:]
    return phrase


def convert(split, data_path, sg_path, output_path, imid2data,
            next_img_id=1, next_id=1, check_images=False):
    data = json.load(open(os.path.join(data_path, f"{split}_balanced_questions.json")))
    sg_data = json.load(open(os.path.join(sg_path, f"{split}_sceneGraphs.json")))
    img2ann = defaultdict(dict)
    for k, v in data.items():
        img2ann[v["imageId"]][k] = v
    patch_annotations(img2ann)

    images, annotations = [], []
    for k, v in img2ann.items():
        filename = f"{k}.jpg"
        cur_img = {
            "file_name": filename,
            "height": imid2data[int(k)]["height"],
            "width": imid2data[int(k)]["width"],
            "id": next_img_id,
            "original_id": k,
        }
        if check_images:
            from PIL import Image, ImageOps

            with Image.open(os.path.join(data_path, "images", filename)) as im:
                im = ImageOps.exif_transpose(im)
                if (im.width, im.height) != (cur_img["width"], cur_img["height"]):
                    cur_img["width"], cur_img["height"] = im.width, im.height

        for annotation in v.values():
            question = annotation["question"]
            answer = annotation["answer"]
            full_answer = annotation["fullAnswer"]
            grounded = annotation["annotations"]["question"]
            if not grounded:
                continue
            # first pass: the per-question grounded phrases (for the
            # full-answer upgrade rule)
            phrase_all = []
            for text_tok_id in grounded:
                span = consolidate_spans([token_ref_to_span(text_tok_id, question)], question)
                qpos = " ".join(question[s0:s1] for s0, s1 in span)
                phrase_all.append(answer if qpos.lower() in ("what", "who", "where") else qpos)
            n_in_full = sum(1 for p in phrase_all if p in full_answer)

            for text_tok_id, box_anno_id in grounded.items():
                obj = sg_data[k]["objects"][box_anno_id]
                bbox = [obj["x"], obj["y"], obj["w"], obj["h"]]
                span = consolidate_spans([token_ref_to_span(text_tok_id, question)], question)
                qpos = " ".join(question[s0:s1] for s0, s1 in span)
                annotations.append(
                    {
                        "area": obj["h"] * obj["w"],
                        "iscrowd": 0,
                        "category_id": 1,
                        "bbox": bbox,
                        "image_id": next_img_id,
                        "id": next_id,
                        "question": question,
                        "answer": answer,
                        "full_answer": full_answer,
                        "tokens_positive": span,
                        "question_positive": qpos,
                        "phrase": clean_phrase(qpos, answer, full_answer, n_in_full),
                    }
                )
                next_id += 1
        next_img_id += 1
        images.append(cur_img)

    ds = {
        "info": [], "licenses": [], "images": images, "annotations": annotations,
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    out = os.path.join(output_path, f"gqa_region_{split}.json")
    json.dump(ds, open(out, "w"))
    print(split, len(images), "images,", len(annotations), "anns ->", out)
    return ds, next_img_id, next_id


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--sg_path", required=True)
    ap.add_argument("--vg_img_data_path", required=True)
    ap.add_argument("--out_path", required=True)
    ap.add_argument("--check_images", action="store_true")
    args = ap.parse_args()
    image_data = json.load(open(os.path.join(args.vg_img_data_path, "image_data.json")))
    imid2data = {x["image_id"]: x for x in image_data}
    os.makedirs(args.out_path, exist_ok=True)
    ds_train, nim, nid = convert(
        "train", args.data_path, args.sg_path, args.out_path, imid2data,
        check_images=args.check_images,
    )
    ds_val, _, _ = convert(
        "val", args.data_path, args.sg_path, args.out_path, imid2data, nim, nid,
        check_images=args.check_images,
    )
    ds = {
        "info": [], "licenses": [],
        "images": ds_train["images"] + ds_val["images"],
        "annotations": ds_train["annotations"] + ds_val["annotations"],
        "categories": [{"supercategory": "object", "id": 1, "name": "object"}],
    }
    json.dump(ds, open(os.path.join(args.out_path, "gqa_region.json"), "w"))


if __name__ == "__main__":
    main()
