#!/usr/bin/env python3
"""Enrich categories carrying a WordNet id (`wnid`) with synset name/
definition/synonyms (LVIS-style fields) via nltk.

Reference behavior: /root/reference/datasets/tools/lvis/
add_category_info_wordnet.py. Requires nltk + the wordnet corpus; gated at
import so environments without nltk can still import the module.
"""

import argparse
import json


def add_wordnet_info(categories):
    from nltk.corpus import wordnet  # gated: heavy optional dep

    out = []
    for category in categories:
        category = dict(category)
        synset = wordnet.synset_from_pos_and_offset("n", int(category["wnid"][1:]))
        synonyms = [l.name() for l in synset.lemmas()]
        category["synset"] = synset.name()
        category["name"] = synonyms[0]
        category["def"] = synset.definition()
        category["synonyms"] = synonyms
        out.append(category)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json_path", required=True)
    ap.add_argument("--out_path", default="")
    args = ap.parse_args()
    data = json.load(open(args.json_path))
    data["categories"] = add_wordnet_info(data["categories"])
    if args.out_path:
        json.dump(data, open(args.out_path, "w"))
        print("wrote", args.out_path)


if __name__ == "__main__":
    main()
