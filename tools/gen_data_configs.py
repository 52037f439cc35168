#!/usr/bin/env python
"""Generate configs/common/data/*.py mirroring the reference's data-config
fan-out (reference configs/common/data/ — 77 files), expressed in this repo's
group schema (dataset_names/mapper/batch_size/sampler/prompt per group;
tests = [{dataset_name, mapper, evaluator_type, iou_types}]).

Run from the repo root: python tools/gen_data_configs.py
Idempotent; skips files listed in KEEP (hand-written ones)."""

import os

OUT = os.path.join(os.path.dirname(__file__), "..", "configs", "common", "data")

KEEP = {"coco.py"}  # pre-existing hand-written file kept as-is

RFS = "RepeatFactorTrainingSampler"

# ---- test-entry shorthands -------------------------------------------------
T_COCO = ("coco_2017_val", "coco", ("bbox", "segm"))
T_COCO_BOX = ("coco_2017_val", "coco", ("bbox",))
T_COCO_PAN = ("coco_2017_val_panoptic", "panoptic", None)
T_COCO_SEM = ("coco_2017_val_panoptic_stuffonly", "sem_seg", None)
T_LVIS = ("lvis_v1_val", "lvis", ("bbox", "segm"))
T_LVIS_MINI = ("lvis_v1_minival", "lvis", ("bbox", "segm"))
T_O365 = ("objects365_val_fixname", "coco", ("bbox",))
T_O365_MINI = ("objects365_minival_fixname", "coco", ("bbox",))
T_OID = ("openimages_v6_val_bbox", "oid", ("bbox",))
T_REFCOCO = ("refcoco-unc-val", "refcoco", None)
T_VG150 = ("visualgenome_150_box_val", "coco", ("bbox",))
T_FLICKR = ("flickr30k_separateGT_val", "refcoco", None)
T_PHRASECUT = ("phrasecut_val", "refcoco", None)

# The big multi-dataset panoptic mixes share one eval suite
MIX_TESTS = [T_LVIS, T_COCO_SEM, T_O365, T_OID, T_REFCOCO]

# LVIS+COCO-panoptic group decomposition: the reference registers one
# "lvis_v1_train+coco_panoptic_separated" separated-panoptic dataset; this
# repo expresses the identical data as the instances json + the stuff-only
# panoptic group (same images, same annotations — flagship mdl config does
# the same).
LVISCOCO = ["lvis_v1_train+coco", "coco_2017_train_panoptic_stuffonly"]


def g(names, sampler="TrainingSampler", prompt="name", **kw):
    return dict(names=list(names), sampler=sampler, prompt=prompt, **kw)


# name (without .py) -> dict(sz=..., train=[groups], tests=[...], note=...)
FILES = {}

# ---- COCO ----
for stem, sz, cp in [
    ("coco_instance", 1024, False),
    ("coco_instance_lsj1024", 1024, False),
    ("coco_instance_lsj1024_cp", 1024, True),
    ("coco_instance_lsj1536_cp", 1536, True),
]:
    FILES[stem] = dict(
        sz=sz,
        train=[g(["coco_2017_train"], copypaste_prob=0.5) if cp else g(["coco_2017_train"])],
        tests=[T_COCO],
    )
for stem, sz in [("coco_panoptic", 1024), ("coco_panoptic_lsj1024", 1024), ("coco_panoptic_separated", 1024)]:
    FILES[stem] = dict(
        sz=sz,
        train=[g(["coco_2017_train_panoptic"])],
        tests=[T_COCO, T_COCO_PAN, T_COCO_SEM],
    )
for stem in ["coco_semantic", "coco_semantic_lsj1024"]:
    FILES[stem] = dict(
        sz=1024,
        train=[g(["coco_2017_train_panoptic_stuffonly"], prompt="name")],
        tests=[T_COCO_SEM],
    )
for stem in ["coco_refcoco_instance", "coco_refcoco_instance_lsj1024"]:
    FILES[stem] = dict(
        sz=1024,
        train=[g(["coco_2017_train"]), g(["refcoco-mixed"], prompt="expression")],
        tests=[T_COCO, T_REFCOCO],
    )
FILES["coco_sa1b_instance"] = dict(
    sz=1024,
    train=[g(["coco_2017_train"]), g(["sa1b"], filter_empty=False)],
    tests=[T_COCO],
)
FILES["coco_sa1b_panoptic"] = dict(
    sz=1024,
    train=[g(["coco_2017_train_panoptic"]), g(["sa1b"], filter_empty=False)],
    tests=[T_COCO, T_COCO_PAN, T_COCO_SEM],
)

# ---- LVIS ----
for stem, sz in [("lvis_instance_lsj1024_cp", 1024), ("lvis_instance_lsj1536_cp", 1536)]:
    FILES[stem] = dict(
        sz=sz,
        train=[g(["lvis_v1_train"], sampler=RFS, copypaste_prob=0.5)],
        tests=[T_LVIS],
    )
FILES["lvis_sa1b_instance"] = dict(
    sz=1024,
    train=[g(["lvis_v1_train"], sampler=RFS), g(["sa1b_4m"], filter_empty=False)],
    tests=[T_LVIS],
)

# ---- the lviscoco* panoptic mixes ----
def mix(stem, groups, tests=None, sz=1024):
    FILES[stem] = dict(sz=sz, train=groups, tests=list(tests or MIX_TESTS))


G_LVISCOCO_CP = g(LVISCOCO, sampler=RFS, copypaste_prob=0.5)
G_LVISCOCO = g(LVISCOCO, sampler=RFS)
G_O365 = g(["objects365_train_fixname"])
G_OID = g(["openimages_v6_train_bbox_nogroup"], sampler=RFS)
G_VG = g(["visualgenome_77962_box_and_region"], prompt="phrase")
G_VGR = g(["visualgenome_77962_box_and_region"], prompt="phrase")
G_SA1B = g(["sa1b"], filter_empty=False)
G_REFCOCO = g(["refcoco-mixed"], prompt="expression")
G_REFCOCO_GBI = g(["refcoco-mixed_group-by-image"], prompt="phrase")
G_GQA = g(["gqa_region_train"], prompt="phrase")
G_PHRASECUT = g(["phrasecut_train"], prompt="phrase")
G_FLICKR = g(["flickr30k_separateGT_train"], prompt="phrase")

mix("lviscocococostuff_panoptic_lsj1024_cp", [G_LVISCOCO_CP], tests=[T_LVIS, T_COCO_SEM])
mix("lviscoco_cocostuff_panoptic_lsj1024_cp", [G_LVISCOCO_CP], tests=[T_LVIS, T_COCO_SEM])
mix("lviscocococostuff_sa1b_panoptic", [G_LVISCOCO, G_SA1B], tests=[T_LVIS, T_COCO_SEM])
mix("lviscocococostuff_refcoco_panoptic_lsj1024", [G_LVISCOCO, G_REFCOCO],
    tests=[T_LVIS, T_COCO_SEM, T_REFCOCO])
mix("lviscocococostuff_refcoco_panoptic_lsj1024_cp", [G_LVISCOCO_CP, G_REFCOCO],
    tests=[T_LVIS, T_COCO_SEM, T_REFCOCO])
mix("lviscocococostuff_refcoco_group_by_image_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_REFCOCO_GBI], tests=[T_LVIS, T_COCO_SEM, T_REFCOCO])
mix("lviscocococostuff_o365_oid_refcoco_panoptic_lsj1024",
    [G_LVISCOCO, G_O365, G_OID, G_REFCOCO])
mix("lviscocococostuff_o365_oid_refcoco_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_REFCOCO])
mix("lviscocococostuff_o365_oid_vg_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VG],
    tests=[T_LVIS, T_COCO_SEM, T_LVIS_MINI, T_O365_MINI, T_O365, T_OID, T_VG150])
mix("lviscocococostuff_o365_oid_vg_refcoco_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VG, G_REFCOCO],
    tests=[T_LVIS, T_COCO_SEM, T_LVIS_MINI, T_O365_MINI, T_O365, T_OID, T_VG150, T_REFCOCO])
mix("lviscoco_cocostuff_o365_oid_vg_refcoco_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VG, G_REFCOCO],
    tests=[T_LVIS, T_COCO_SEM, T_O365, T_OID, T_VG150, T_REFCOCO])
mix("lviscocococostuff_o365_oid_vgr_refcoco_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_REFCOCO])
mix("lviscocococostuff_o365_oid_vgr_refcoco_group_by_image_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_REFCOCO_GBI])
mix("lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_panoptic_lsj1024_cp",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_SA1B, G_REFCOCO_GBI],
    tests=[T_LVIS, T_COCO_SEM, T_LVIS_MINI, T_O365_MINI, T_O365, T_OID, T_REFCOCO])
for sz in (1024, 1536):
    mix(f"lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_gqa_panoptic_lsj{sz}_cp",
        [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_SA1B, G_REFCOCO_GBI, G_GQA], sz=sz)
    mix(f"lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_gqa_phrasecut_panoptic_lsj{sz}_cp",
        [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_SA1B, G_REFCOCO_GBI, G_GQA, G_PHRASECUT], sz=sz)
    mix(f"lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_gqa_phrasecut_flickr30k_panoptic_lsj{sz}_cp",
        [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_SA1B, G_REFCOCO_GBI, G_GQA, G_PHRASECUT, G_FLICKR],
        tests=[T_LVIS, T_COCO_SEM, T_LVIS_MINI, T_O365_MINI, T_O365, T_OID, T_REFCOCO], sz=sz)
mix("lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_gqa_phrasecut_flickr30k_panoptic_lsj1024_cp_mdl",
    [G_LVISCOCO_CP, G_O365, G_OID, G_VGR, G_SA1B, G_REFCOCO_GBI, G_GQA, G_PHRASECUT, G_FLICKR],
    tests=[T_LVIS, T_COCO_SEM, T_LVIS_MINI, T_O365_MINI, T_O365, T_OID, T_REFCOCO])

# ---- O365 ----
FILES["o365_instance_lsj1024"] = dict(
    sz=1024, train=[G_O365], tests=[T_O365],
)

# ---- grounding families ----
for stem, sz in [("refcoco_instance", 1024), ("refcoco_instance_lsj1024", 1024)]:
    FILES[stem] = dict(sz=sz, train=[g(["refcoco-mixed"], prompt="expression")], tests=[T_REFCOCO])
for stem in ["refcoco_group_by_image_instance", "refcoco_group_by_image_instance_lsj1024"]:
    FILES[stem] = dict(sz=1024, train=[G_REFCOCO_GBI], tests=[T_REFCOCO])
for stem in ["flickr30k_instance", "flickr30k_instance_lsj1024"]:
    FILES[stem] = dict(sz=1024, train=[G_FLICKR], tests=[T_FLICKR])
for stem in ["phrasecut_instance", "phrasecut_instance_lsj1024"]:
    FILES[stem] = dict(sz=1024, train=[G_PHRASECUT], tests=[T_PHRASECUT])
FILES["gqa_region_instance"] = dict(sz=1024, train=[G_GQA, G_VGR], tests=[T_REFCOCO])
FILES["vgregion_instance"] = dict(sz=1024, train=[G_VGR], tests=[T_REFCOCO])
FILES["grit_instance"] = dict(sz=1024, train=[g(["grit"], prompt="phrase")], tests=[T_REFCOCO])
FILES["grit_instance_lsj224"] = dict(sz=224, train=[g(["grit"], prompt="phrase")], tests=[T_REFCOCO])
FILES["grit_sa1b_instance"] = dict(
    sz=1024,
    train=[g(["grit"], prompt="phrase"), g(["sa1b_4m"], filter_empty=False)],
    tests=[T_REFCOCO],
)

# ---- semantic / panoptic eval families ----
for stem, train_name, val_name in [
    ("ade20k_semantic", "ade20k_sem_seg_train", "ade20k_sem_seg_val"),
    ("ade20k_semantic_lsj1024", "ade20k_sem_seg_train", "ade20k_sem_seg_val"),
    ("ade20kfull_semantic_lsj1024", "ade20k_full_sem_seg_train", "ade20k_full_sem_seg_val"),
    ("coco_semantic", "coco_2017_train_panoptic_stuffonly", "coco_2017_val_panoptic_stuffonly"),
]:
    FILES[stem] = dict(
        sz=1024, train=[g([train_name])], tests=[(val_name, "sem_seg", None)],
    )
FILES["bdd10k_semantic_lsj1024"] = dict(
    sz=1024, train=[g(["bdd10k_sem_seg_train"])],
    tests=[("bdd10k_val_sem_seg", "sem_seg", None)],
)
FILES["pascalcontext59_semantic_lsj1024"] = dict(
    sz=1024, train=[], tests=[("pascal_context_59_sem_seg_val", "sem_seg", None)],
)
FILES["pascalcontext459_semantic_lsj1024"] = dict(
    sz=1024, train=[], tests=[("pascal_context_459_sem_seg_val", "sem_seg", None)],
)
FILES["pascalvoc20_semantic_lsj1024"] = dict(
    sz=1024, train=[], tests=[("pascalvoc20_sem_seg_val", "sem_seg", None)],
)
FILES["cityscapes_semantic_lsj1024"] = dict(
    sz=1024, train=[g(["cityscapes_fine_sem_seg_train"])],
    tests=[("cityscapes_fine_sem_seg_val", "sem_seg", None)],
)
for stem in ["ade20k_panoptic", "ade20k_panoptic_lsj1024"]:
    FILES[stem] = dict(
        sz=1024, train=[g(["ade20k_panoptic_train"])],
        tests=[("ade20k_panoptic_val", "panoptic", None), ("ade20k_sem_seg_val", "sem_seg", None)],
    )
FILES["bdd10k_panoptic_lsj1024"] = dict(
    sz=1024, train=[], tests=[("bdd10k_40_panoptic_val", "panoptic", None)],
)
FILES["cityscapes_panoptic_lsj1024"] = dict(
    sz=1024, train=[g(["cityscapes_fine_panoptic_train"])],
    tests=[("cityscapes_fine_panoptic_val", "panoptic", None)],
)
FILES["pascalvocpart_panoptic"] = dict(
    sz=1024, train=[g(["pascalvocpart_train"])],
    tests=[("pascal_parts_panoptic_val", "panoptic", None)],
)

# ---- suites (one test entry per member dataset, filled by the task config
# via the registered split tables) ----
for stem, sz in [
    ("odinw13_instance", 1024), ("odinw13_instance_lsj1024", 1024),
    ("odinw13_instance_lsj1536", 1536),
    ("odinw35_instance", 1024), ("odinw35_instance_lsj1024", 1024),
    ("odinw35_instance_lsj1536", 1536),
    ("odinwvoc_instance_lsj1024", 1024),
    ("seginw_instance", 1024), ("seginw_instance_lsj1024", 1024),
    ("seginw_instance_lsj1536", 1536),
    ("roboflow100_instance_lsj1024", 1024),
    ("d3_instance_lsj1024", 1024),
]:
    FILES[stem] = dict(sz=sz, suite=stem)

# ---- constants (mirrors the reference's shared color/category constants) ----
CONSTANTS = '''\
# Shared data constants (reference: configs/common/data/constants.py — the
# detectron2 pixel statistics used by every model tree).
constants = dict(
    imagenet_rgb256_mean=[123.675, 116.28, 103.53],
    imagenet_rgb256_std=[58.395, 57.12, 57.375],
    imagenet_bgr256_mean=[103.53, 116.28, 123.675],
    imagenet_bgr256_std=[1.0, 1.0, 1.0],
)
'''

SUITE_SNIPPET = {
    "odinw13": '''\
from ape_tpu.data.datasets.builtin import ODINW_13_TEST as _names''',
    "odinw35": '''\
# the reference evaluates odinw35 on the _test splits (PascalVOC on _val);
# pick per-group: _test when present, else _val
from ape_tpu.data.datasets import metadata as M

_names = sorted(
    next(
        (k for k in group if k.endswith("_test")),
        next((k for k in group if k.endswith("_val")), None),
    )
    for group in M.odinw_splits().values()
)''',
    "odinwvoc": '''\
_names = ["odinw_PascalVOC_val"]''',
    "seginw": '''\
from ape_tpu.data.datasets import metadata as M

_names = sorted(f"{d}_val" for d in M.seginw_categories())''',
    "roboflow100": '''\
from ape_tpu.data.catalog import DatasetCatalog

_names = sorted(n for n in DatasetCatalog.list() if n.startswith("rf100_"))''',
    "d3": '''\
_names = ["d3_inter_scenario", "d3_intra_scenario"]''',
}


def suite_kind(stem):
    for k in ("odinw13", "odinw35", "odinwvoc", "seginw", "roboflow100", "d3"):
        if stem.startswith(k):
            return k
    raise KeyError(stem)


def render(stem, spec):
    ref = f"configs/common/data/{stem}.py"
    lines = [
        f"# Auto-generated data config mirroring the reference {ref}",
        "# (this repo's group schema; LSJ at the stated size stands in for the",
        "# reference's multi-scale ResizeShortestEdge in the non-lsj variants —",
        "# fixed square shapes are the TPU-native input contract).",
        "from ape_tpu.config import L",
        "from ape_tpu.data.mapper import DatasetMapperDETR",
        "",
        f"image_size = {spec['sz']}",
        "",
    ]
    if "suite" in spec:
        kind = suite_kind(stem)
        lines.append(SUITE_SNIPPET[kind])
        lines += [
            "",
            "dataloader = dict(",
            "    train=dict(dataset_names=[], mapper=None, batch_size=1),",
            "    tests=[",
            "        dict(",
            "            dataset_name=n,",
            "            mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),",
            f"            evaluator_type={'\"d3\"' if kind == 'd3' else 'None'},",
            "        )",
            "        for n in _names",
            "    ],",
            ")",
        ]
        return "\n".join(lines) + "\n"

    lines += [
        'def _group(names, sampler="TrainingSampler", prompt="name", **kw):',
        "    return dict(",
        "        dataset_names=list(names),",
        "        mapper=L(DatasetMapperDETR)(image_size=image_size, is_train=True),",
        "        batch_size=16,",
        "        sampler=sampler,",
        "        prompt=prompt,",
        "        **kw,",
        "    )",
        "",
        "",
    ]
    groups = spec["train"]
    if not groups:
        train_src = "    train=dict(dataset_names=[], mapper=None, batch_size=1),"
    elif len(groups) == 1:
        train_src = f"    train=_group({_gargs(groups[0])}),"
    else:
        inner = ",\n".join(f"        _group({_gargs(gr)})" for gr in groups)
        train_src = "    train=dict(groups=[\n" + inner + ",\n    ]),"
    tests_src = []
    for name, etype, ious in spec["tests"]:
        extra = f", iou_types={ious!r}" if ious else ""
        tests_src.append(
            "        dict(dataset_name=%r,\n"
            "             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),\n"
            "             evaluator_type=%r%s)," % (name, etype, extra)
        )
    lines += [
        "dataloader = dict(",
        train_src,
        "    tests=[",
        *tests_src,
        "    ],",
        ")",
    ]
    return "\n".join(lines) + "\n"


def _gargs(gr):
    parts = [repr(gr["names"])]
    if gr.get("sampler", "TrainingSampler") != "TrainingSampler":
        parts.append(f"sampler={gr['sampler']!r}")
    if gr.get("prompt", "name") != "name":
        parts.append(f"prompt={gr['prompt']!r}")
    for k in ("copypaste_prob", "filter_empty"):
        if k in gr:
            parts.append(f"{k}={gr[k]!r}")
    return ", ".join(parts)


def main():
    os.makedirs(OUT, exist_ok=True)
    written = 0
    for stem, spec in sorted(FILES.items()):
        fn = os.path.join(OUT, stem + ".py")
        if os.path.basename(fn) in KEEP:
            continue
        with open(fn, "w") as f:
            f.write(render(stem, spec))
        written += 1
    with open(os.path.join(OUT, "constants.py"), "w") as f:
        f.write(CONSTANTS)
    print(f"wrote {written} data configs + constants.py to {OUT}")


if __name__ == "__main__":
    main()
