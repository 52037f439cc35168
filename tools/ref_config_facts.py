#!/usr/bin/env python
"""Extract the load-bearing recipe facts from every reference task config.

The reference's configs are not importable here (detectron2/torch-free
environment), but they ARE greppable: `train.max_iter = 720000`,
`lr_multiplier.scheduler.milestones = [640000]`,
`model.model_vision.num_classes = 1256`, the per-criterion num_classes zip
block, `select_box_nums_for_evaluation`, `name_prompt_fusion_type`, and
per-dataset `total_batch_size` are all literal assignments. This module
regex-parses them, resolves each file's relative-import chain (a config that
imports `(model, optimizer, train)` from another config inherits that file's
facts for the imported names), and emits one fact dict per config path.

Outputs `configs/ref_facts.json` (checked in) so the fidelity test
(tests/test_config_fidelity.py) validates in environments without
/root/reference. Re-run `python tools/ref_config_facts.py` against a live
reference tree to refresh.

Only VALUES are extracted (hyperparameter tables that must match to be
correct) — no reference code is copied.
"""

from __future__ import annotations

import ast
import json
import os
import re
import sys

REF = "/root/reference/configs"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs", "ref_facts.json")

# fact name -> (regex over the file text, owning import name, parser)
_INT = lambda m: int(m.group(1))
_STR = lambda m: m.group(1)
_LIST = lambda m: ast.literal_eval(m.group(1))
_BOOL = lambda m: m.group(1) == "True"

PATTERNS = [
    ("max_iter", r"train\.max_iter\s*=\s*(\d+)", "train", _INT),
    ("eval_period", r"train\.eval_period\s*=\s*(\d+)", "train", _INT),
    (
        "milestones",
        r"(?:lr_multiplier\.scheduler\.milestones|milestones)\s*=\s*(\[[\d\s,]*\])",
        "lr_multiplier",
        _LIST,
    ),
    (
        "num_classes",
        r"model\.model_vision\.num_classes\s*=\s*(\d+)",
        "model",
        _INT,
    ),
    (
        "select_box_nums_for_evaluation",
        r"model\.model_vision\.select_box_nums_for_evaluation\s*=\s*(\d+)",
        "model",
        _INT,
    ),
    (
        "name_prompt_fusion_type",
        r"name_prompt_fusion_type\s*=\s*\"(\w+)\"",
        "model",
        _STR,
    ),
    (
        "instance_on",
        r"model\.model_vision\.instance_on\s*=\s*(True|False)",
        "model",
        _BOOL,
    ),
    (
        "semantic_on",
        r"model\.model_vision\.semantic_on\s*=\s*(True|False)",
        "model",
        _BOOL,
    ),
    (
        "panoptic_on",
        r"model\.model_vision\.panoptic_on\s*=\s*(True|False)",
        "model",
        _BOOL,
    ),
    (
        "total_batch_size",
        r"total_batch_size\s*=\s*(\d+)",
        None,  # rides on the dataloader loop in the file itself; no inherit
        _INT,
    ),
    (
        "output_resolution",
        r"model\.model_vision\.output_resolution\s*=\s*(\d+)",
        "model",
        _INT,
    ),
]

# `from ...A.B.C import (x, y)` / `from .C import x` / `from .models.C import x`
_IMPORT_RE = re.compile(
    r"^from\s+(\.+)([\w.]*)\s+import\s+\(?([\w,\s]+)\)?", re.MULTILINE
)

# the per-criterion num_classes zip block:
#   model.model_vision.criterion = [criterion for _ in range(N)]
#   for criterion, num_classes in zip(
#       model.model_vision.criterion, <list expr, possibly [x,]*k>
#   ):
_NCRIT_RE = re.compile(r"criterion\s*=\s*\[criterion for _ in range\((\d+)\)\]")
_ZIP_RE = re.compile(
    r"for criterion, num_classes in zip\(\s*model\.model_vision\.criterion,(.*?)\):",
    re.DOTALL,
)
# single-criterion form: model.model_vision.criterion[0].num_classes = N
_CRIT0_RE = re.compile(r"criterion\[0\]\.num_classes\s*=\s*(\d+)")


def _safe_list_expr(expr: str):
    """Evaluate `[1000,] * 35` / `[1256, 365, ...]` without eval()."""
    expr = expr.strip()
    try:
        # wrap in parens: the source splits the expr over lines (legal inside
        # the original zip(...) call, not standalone)
        node = ast.parse(f"({expr})", mode="eval").body
    except SyntaxError:
        return None

    def ev(n):
        if isinstance(n, ast.List):
            return [ev(e) for e in n.elts]
        if isinstance(n, ast.Constant) and isinstance(n.value, (int, float)):
            return n.value
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
            return ev(n.left) * ev(n.right)
        raise ValueError(ast.dump(n))

    try:
        return ev(node)
    except ValueError:
        return None


def parse_file(path: str) -> dict:
    """Facts explicitly assigned in this one file (no inheritance)."""
    with open(path) as f:
        text = f.read()
    facts = {}
    for name, pat, _owner, conv in PATTERNS:
        matches = list(re.finditer(pat, text))
        if matches:
            facts[name] = conv(matches[-1])  # last assignment wins
    m = _ZIP_RE.search(text)
    if m:
        lst = _safe_list_expr(m.group(1).strip().rstrip(","))
        if lst is not None:
            facts["criterion_num_classes"] = lst
            facts["criterion_num_classes_prefix"] = False
    else:
        m = _CRIT0_RE.search(text)
        if m:
            # only criterion[0] is pinned — the reference file says nothing
            # about the rest of the list (prefix comparison only)
            facts["criterion_num_classes"] = [int(m.group(1))]
            facts["criterion_num_classes_prefix"] = True
    m = _NCRIT_RE.search(text)
    if m:
        facts["num_criteria"] = int(m.group(1))
    return facts


def _imports(path: str, root: str):
    """Yield (imported_names, parent_path) for relative config imports."""
    with open(path) as f:
        text = f.read()
    pkg_dir = os.path.dirname(path)
    for m in _IMPORT_RE.finditer(text):
        dots, mod, names = m.group(1), m.group(2), m.group(3)
        base = pkg_dir
        for _ in range(len(dots) - 1):
            base = os.path.dirname(base)
        parent = os.path.join(base, *mod.split(".")) + ".py" if mod else None
        if parent is None or not os.path.exists(parent):
            continue
        if os.path.commonpath([os.path.abspath(parent), os.path.abspath(root)]) != os.path.abspath(root):
            continue
        yield [n.strip() for n in names.split(",") if n.strip()], parent


# which import name carries which facts down the chain
_OWNERS = {name: owner for name, _p, owner, _c in PATTERNS}
_OWNERS["criterion_num_classes"] = "model"
_OWNERS["criterion_num_classes_prefix"] = "model"
_OWNERS["num_criteria"] = "model"


def resolve(path: str, root: str, _memo=None) -> dict:
    """Facts for `path`, inheriting through its import chain."""
    if _memo is None:
        _memo = {}
    key = os.path.abspath(path)
    if key in _memo:
        return _memo[key]
    _memo[key] = {}  # cycle guard
    own = parse_file(path)
    merged = {}
    for names, parent in _imports(path, root):
        pf = resolve(parent, root, _memo)
        for fact, val in pf.items():
            owner = _OWNERS.get(fact)
            if owner is None or owner in names:
                merged[fact] = val
    merged.update(own)
    _memo[key] = merged
    return merged


def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else REF
    facts = {}
    memo = {}
    for dirpath, _dirs, files in os.walk(ref):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), ref)
            if rel.startswith("common/"):
                continue
            f = resolve(os.path.join(dirpath, fn), ref, memo)
            if f:
                facts[rel] = f
    with open(OUT, "w") as fh:
        json.dump(facts, fh, indent=1, sort_keys=True)
    print(f"{len(facts)} config fact sets -> {OUT}")


if __name__ == "__main__":
    main()
