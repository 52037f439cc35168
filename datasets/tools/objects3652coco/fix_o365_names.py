#!/usr/bin/env python3
"""Fix the 13 known-broken Objects365 category names -> `*_fixname.json`.

Reference behavior: /root/reference/datasets/tools/objects3652coco/
fix_o365_names.py + Objects365_names_fix.csv — the (old, new) name table is
data, stored here as datasets/assets/objects365_names_fix.json
({id: [old_name, new_name]}). Old names must match the json's categories;
differing new names replace them. The repo's `*_fixname` dataset
registrations expect the output of this script.
"""

import argparse
import json
import os


def fix_names(categories, table):
    out = []
    renamed = 0
    for c in categories:
        old, new = table[int(c["id"])]
        assert old.strip() == c["name"].strip(), (c, old)
        if old != new:
            c = dict(c, name=new)
            renamed += 1
        out.append(c)
    return out, renamed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True, help="zhiyuan_objv2_*.json or objects365_*.json")
    ap.add_argument(
        "--fix_name_map",
        default=os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                             "objects365_names_fix.json"),
    )
    args = ap.parse_args()
    table = {int(k): v for k, v in json.load(open(args.fix_name_map)).items()}
    data = json.load(open(args.ann))
    data["categories"], renamed = fix_names(data["categories"], table)
    out = args.ann[:-5] + "_fixname.json"
    json.dump(data, open(out, "w"))
    print(f"renamed {renamed} categories ->", out)


if __name__ == "__main__":
    main()
