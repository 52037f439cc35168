#!/usr/bin/env python
"""Generate the task-dir config fan-out mirroring the reference's ~280
configs/<Task>/<family>/<variant>.py files (same relative paths), composed
from this repo's common/models + common/backbone + common/data configs.

Never overwrites an existing file — hand-written configs win. Run from the
repo root: python tools/gen_task_configs.py [--list]
"""

import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "configs")
REF = "/root/reference/configs"

# recipe facts regex-extracted from the reference configs (VALUES only —
# hyperparameter tables that must match to be correct). Refresh with
# tools/ref_config_facts.py; validated by tests/test_config_fidelity.py.
_FACTS_PATH = os.path.join(ROOT, "ref_facts.json")
FACTS = json.load(open(_FACTS_PATH)) if os.path.exists(_FACTS_PATH) else {}

# ---------------------------------------------------------------------------
# backbone token -> (common/backbone file for lsj1024, file for lsj1536,
#                    vit_num_layers, language kind)
# language kinds: "eva02clip" (EVA-02-CLIP text tower), "eva01clip"
# (EVA-01-CLIP g-14 text: width 768), None (closed vocab / legacy)
BACKBONES = {
    "vitt_eva02": ("vitt_eva02.py", "vitt_eva02.py", 12, "eva01clip"),
    "vitl_eva02": ("vitl_eva02.py", "vitl_eva02_1536.py", 24, "eva01clip"),
    "vitl_eva02_clip": ("vitl_eva02_clip.py", "vitl_eva02_clip_1536.py", 24, "eva02clip"),
    "vitg_eva01": ("vitg_eva01.py", "vitg_eva01_1536.py", 40, "eva01clip"),
    "vitg_eva01_clip": ("vitg_eva01_clip_1024.py", "vitg_eva01_clip_1536.py", 40, "eva01clip"),
    "vite_eva02_clip": ("vite_eva02_clip_1024.py", "vite_eva02_clip_1536.py", 64, "eva02clip"),
}

# legacy-family backbone tokens (deformable_deta/deformable_detr trees):
# expressed inline via EVAViT flags — plain MAE-ViTDet (gelu MLP + real
# decomposed rel-pos, no rope), EVA-01, or OpenAI-CLIP ViT-B (abs pos only)
LEGACY_BB = {
    "vitb": dict(embed_dim=768, depth=12, num_heads=12, window_size=14,
                 every=3, mlp="gelu", rel_pos=True, rope=False),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16, window_size=14,
                 every=6, mlp="gelu", rel_pos=True, rope=False),
    "vitb_clip_openai": dict(embed_dim=768, depth=12, num_heads=12, window_size=14,
                             every=3, mlp="gelu", rel_pos=False, rope=False),
    "vitl_eva": dict(embed_dim=1024, depth=24, num_heads=16, window_size=16,
                     every=4, mlp="gelu", rel_pos=True, rope=False),
    "vitg_eva": dict(embed_dim=1408, depth=40, num_heads=16, window_size=16,
                     every=4, mlp="gelu", rel_pos=True, rope=False),
    "vitl_eva02": dict(embed_dim=1024, depth=24, num_heads=16, window_size=16,
                       every=6, mlp="swiglu_subln", rel_pos=False, rope=True),
}

SCHEDULES = {
    "12ep": (90000, [75000, 90000]),
    "24ep": (180000, [150000, 180000]),
    "36ep": (270000, [225000, 270000]),
    "50ep": (375000, [330000, 375000]),
    "160k": (160000, [135000]),
    "400k": (400000, [340000]),
    "180k": (180000, [150000]),
    "270k": (270000, [225000]),
    "337k": (337500, [281250]),
    "360k": (360000, [300000]),
    "540k": (540000, [450000]),
    "720k": (720000, [600000]),
    "1080k": (1080000, [900000]),
    "2160k": (2160000, [1800000]),
    "45k": (45000, [37500]),
    "50k": (50000, [42000]),
    "90k": (90000, [75000]),
}

# group tag -> (num_classes, ratio, fed-loss weights dataset or None)
GROUP_INFO = {
    "lviscoco": (1256, 1.0, "lvis_v1_train"),
    "lvis": (1203, 1.0, "lvis_v1_train"),
    "o365": (365, 1.0, None),
    "oid": (601, 1.0, "openimages_v6"),
    "vg": (256, 1.0, None),
    "sa1b": (1, 1.0, None),
    "refcoco": (256, 0.1, None),
    "gqa": (256, 0.1, None),
    "phrasecut": (256, 0.1, None),
    "flickr": (256, 0.1, None),
    "grit": (256, 1.0, None),
    "coco": (80, 1.0, None),
    "cocopan": (133, 1.0, None),
    "cocostuff": (53, 1.0, None),
}


def groups_for_data(stem):
    """Group tags, in the order the data config's groups appear."""
    if stem.startswith("lviscoco"):
        tags = ["lviscoco"]
        for part, tag in [("o365", "o365"), ("oid", "oid"), ("vg", "vg"),
                          ("sa1b", "sa1b"), ("refcoco", "refcoco"),
                          ("gqa", "gqa"), ("phrasecut", "phrasecut"),
                          ("flickr30k", "flickr")]:
            if f"_{part}" in stem:
                tags.append(tag)
        return tags
    if stem.startswith("lvis_sa1b"):
        return ["lvis", "sa1b"]
    if stem.startswith("lvis"):
        return ["lvis"]
    if stem.startswith("coco_sa1b_panoptic"):
        return ["cocopan", "sa1b"]
    if stem.startswith("coco_sa1b"):
        return ["coco", "sa1b"]
    if stem.startswith("coco_refcoco"):
        return ["coco", "refcoco"]
    if stem.startswith("coco_panoptic"):
        return ["cocopan"]
    if stem.startswith("coco_semantic"):
        return ["cocostuff"]
    if stem.startswith("coco"):
        return ["coco"]
    if stem.startswith("grit_sa1b"):
        return ["grit", "sa1b"]
    if stem.startswith("grit"):
        return ["grit"]
    if stem.startswith("gqa"):
        return ["gqa", "vg"]
    if stem.startswith("o365"):
        return ["o365"]
    for p, t in [("refcoco", "refcoco"), ("flickr30k", "flickr"),
                 ("phrasecut", "phrasecut"), ("vgregion", "vg")]:
        if stem.startswith(p):
            return [t]
    return []  # eval-only suites / semantic eval sets


# task dir -> (data stem chooser(tokens) -> stem, num_text, num_classes for
# eval-only dirs)
def _fixed(stem):
    return lambda tok: stem


def _coco_inst(tok):
    sz = "1536" if "lsj1536" in tok else "1024"
    cp = "_cp" if "cp" in tok else ""
    if cp:
        return f"coco_instance_lsj{sz}_cp"
    return f"coco_instance_lsj{sz}" if sz == "1024" else "coco_instance_lsj1536_cp"


def _lvis_inst(tok):
    return "lvis_instance_lsj1536_cp" if "lsj1536" in tok else "lvis_instance_lsj1024_cp"


def _flagship(tok):
    sz = "1536" if "lsj1536" in tok else "1024"
    return ("lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_gqa_"
            f"phrasecut_flickr30k_panoptic_lsj{sz}_cp")


def _grit(tok):
    return "grit_instance_lsj224" if "lsj224" in tok else "grit_instance"


def _odinw(tok):
    if "13" in tok:
        return "odinw13_instance_lsj1024"
    return "odinw35_instance_lsj1024"


DIRS = {
    "ADE20kFull_SemanticSegmentation": (_fixed("ade20kfull_semantic_lsj1024"), 864, 847),
    "ADE20k_PanopticSegmentation": (_fixed("ade20k_panoptic_lsj1024"), 160, 150),
    "ADE20k_SemanticSegmentation": (_fixed("ade20k_semantic_lsj1024"), 160, 150),
    "BDD10k_PanopticSegmentation": (_fixed("bdd10k_panoptic_lsj1024"), 64, 40),
    "BDD10k_SemanticSegmentation": (_fixed("bdd10k_semantic_lsj1024"), 32, 19),
    "COCO_Detection": (_coco_inst, 96, 80),
    "COCO_InstanceSegmentation": (_coco_inst, 96, 80),
    "COCO_PanopticSegmentation": (_fixed("coco_panoptic_lsj1024"), 160, 133),
    "COCO_REFCOCO": (_fixed("coco_refcoco_instance_lsj1024"), 96, 80),
    "COCO_SA1B_InstanceSegmentation": (_fixed("coco_sa1b_instance"), 96, 80),
    "COCO_SA1B_PanopticSegmentation": (_fixed("coco_sa1b_panoptic"), 160, 133),
    "COCO_SemanticSegmentation": (_fixed("coco_semantic_lsj1024"), 64, 53),
    "Cityscapes_PanopticSegmentation": (_fixed("cityscapes_panoptic_lsj1024"), 32, 19),
    "D3_InstanceSegmentation": (_fixed("d3_instance_lsj1024"), 256, 256),
    "Flickr30k_VisualGrounding": (_fixed("flickr30k_instance_lsj1024"), 256, 256),
    "GQA_VisualGrounding": (_fixed("gqa_region_instance"), 256, 256),
    "GRIT_SA1B_VisualGrounding": (_fixed("grit_sa1b_instance"), 256, 256),
    "GRIT_VisualGrounding": (_grit, 256, 256),
    "LVISCOCOCOCOSTUFF_O365_OID_VG": (
        _fixed("lviscocococostuff_o365_oid_vg_panoptic_lsj1024_cp"), 1280, 1256),
    "LVISCOCOCOCOSTUFF_O365_OID_VGR_REFCOCO": (
        _fixed("lviscocococostuff_o365_oid_vgr_refcoco_panoptic_lsj1024_cp"), 1280, 1256),
    "LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO": (
        _fixed("lviscocococostuff_o365_oid_vgr_sa1b_refcoco_group_by_image_panoptic_lsj1024_cp"),
        1280, 1256),
    "LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k": (
        _flagship, 1280, 1256),
    "LVISCOCOCOCOSTUFF_PanopticSegmentation": (
        _fixed("lviscocococostuff_panoptic_lsj1024_cp"), 1280, 1256),
    "LVISCOCOCOCOSTUFF_REFCOCO": (
        _fixed("lviscocococostuff_refcoco_panoptic_lsj1024_cp"), 1280, 1256),
    "LVISCOCO_COCOSTUFF_O365_OID_VG_REFCOCO": (
        _fixed("lviscoco_cocostuff_o365_oid_vg_refcoco_panoptic_lsj1024_cp"), 1280, 1256),
    "LVISCOCO_COCOSTUFF_PanopticSegmentation": (
        _fixed("lviscoco_cocostuff_panoptic_lsj1024_cp"), 1280, 1256),
    "LVIS_Detection": (_lvis_inst, 1216, 1203),
    "LVIS_InstanceSegmentation": (_lvis_inst, 1216, 1203),
    "LVIS_SA1B_InstanceSegmentation": (_fixed("lvis_sa1b_instance"), 1216, 1203),
    "ODinW_Detection": (_odinw, 256, 80),
    "PascalContext459_SemanticSegmentation": (
        _fixed("pascalcontext459_semantic_lsj1024"), 480, 459),
    "PascalContext59_SemanticSegmentation": (
        _fixed("pascalcontext59_semantic_lsj1024"), 64, 59),
    "PascalVOC20_SemanticSegmentation": (
        _fixed("pascalvoc20_semantic_lsj1024"), 32, 20),
    "PascalVOCParts_PanopticSegmentation": (_fixed("pascalvocpart_panoptic"), 160, 136),
    "PhraseCut_VisualGrounding": (_fixed("phrasecut_instance_lsj1024"), 256, 256),
    "REFCOCO_VisualGrounding": (_fixed("refcoco_instance_lsj1024"), 256, 256),
    "Roboflow_Detection": (_fixed("roboflow100_instance_lsj1024"), 256, 80),
    "SegInW_InstanceSegmentation": (_fixed("seginw_instance_lsj1024"), 256, 80),
    "VisualGenome_VisualGrounding": (_fixed("vgregion_instance"), 256, 256),
}

LANG = {
    "eva02clip": (
        "language = dict(\n"
        "    width=1024, heads=16, layers=24, output_dim=1024,\n"
        '    bpe_path=os.environ.get("CLIP_BPE_PATH", ""), max_batch_size=256,\n'
        ")"
    ),
    # EVA-01-CLIP g-14 text tower (clip_wrapper_eva01.py): standard CLIP text
    # transformer width 768/12L, projected to 1024
    "eva01clip": (
        "language = dict(\n"
        "    width=768, heads=12, layers=12, output_dim=1024,\n"
        '    bpe_path=os.environ.get("CLIP_BPE_PATH", ""), max_batch_size=2560,\n'
        ")"
    ),
    "bert": (
        "language = dict(\n"
        '    kind="bert",\n'
        '    model_name_or_path=os.environ.get("BERT_PATH", "models/bert-base-uncased/"),\n'
        ")"
    ),
    "llama2": (
        "language = dict(\n"
        '    kind="llama2",\n'
        '    model_name_or_path=os.environ.get("LLAMA2_PATH", "models/meta-llama/Llama-2-7b-hf/"),\n'
        ")"
    ),
}


def parse_stem(stem):
    """Extract (backbone, vlf, lsj, cp, sched, bs, iter_size, extras)."""
    t = {}
    toks = stem.split("_")
    t["vlf"] = "vlf" in toks
    t["cp"] = "cp" in toks
    m = re.search(r"lsj(\d+)", stem)
    t["lsj"] = int(m.group(1)) if m else 1024
    # backbone: longest matching token run
    bb = None
    for cand in sorted(list(BACKBONES) + list(LEGACY_BB), key=len, reverse=True):
        if f"_{cand}_" in f"_{stem}_":
            bb = cand
            break
    if bb is None and "_r50" in f"_{stem}":
        bb = "r50"
    t["bb"] = bb
    # schedule / batch tokens
    sched = None
    bs = None
    iter_size = 1
    for tok in toks:
        m = re.fullmatch(r"(\d+)x(\d+)[x_]?(\d+k)?", tok)
        if m and m.group(3):
            bs, iter_size, sched = int(m.group(1)), int(m.group(2)), m.group(3)
            continue
        m = re.fullmatch(r"(\d+)x(\d+k)", tok)
        if m:
            bs, sched = int(m.group(1)), m.group(2)
            continue
        if tok in SCHEDULES:
            sched = tok
    # NxM_Tk split across tokens (e.g. 16x4_1080k)
    m = re.search(r"_(\d+)x(\d+)_(\d+k)", stem)
    if m:
        bs, iter_size, sched = int(m.group(1)), int(m.group(2)), m.group(3)
    t["sched"] = sched
    t["bs"] = bs
    t["iter_size"] = iter_size
    for extra in ("mdl", "fsdp", "mp", "lp", "iouloss", "bert", "llama2",
                  "separated", "4scale"):
        t[extra] = extra in toks
    t["eval_suite"] = None
    m = re.search(r"eval_(odinw13|odinw35|seginw)", stem)
    if m:
        t["eval_suite"] = m.group(1)
    return t


HEADER = '''\
# Auto-generated task config mirroring the reference
# configs/{relpath} (same recipe expressed against this repo's model tree;
# see tools/gen_task_configs.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)
'''


def render(relpath):
    taskdir = relpath.split("/")[0]
    family = relpath.split("/")[1]
    stem = os.path.splitext(os.path.basename(relpath))[0]
    t = parse_stem(stem)
    data_fn, num_text, eval_nc = DIRS[taskdir]
    data_stem = data_fn(stem)
    depth_up = "../../"

    lines = [HEADER.format(relpath=relpath)]

    # ---- model ----
    if t["bb"] == "r50" or t["bb"] is None:
        lines.append(
            f'_base = LazyConfig.load(os.path.join(_dir, "{depth_up}common/models/ape_deta_r50.py"))'
        )
        lines.append("model = _base.model")
        vit_layers, lang_kind = 0, "eva01clip"
    elif t["bb"] in BACKBONES and family == "ape_deta":
        f1024, f1536, vit_layers, lang_kind = BACKBONES[t["bb"]]
        bbf = f1536 if t["lsj"] == 1536 else f1024
        lines.append(
            f'_base = LazyConfig.load(os.path.join(_dir, "{depth_up}common/models/ape_deta.py"))'
        )
        lines.append(
            f'_bb = LazyConfig.load(os.path.join(_dir, "{depth_up}common/backbone/{bbf}"))'
        )
        lines.append("model = _base.model")
        lines.append("model.backbone = _bb.backbone")
    else:
        # legacy family inline backbone
        spec = LEGACY_BB[t["bb"]]
        lines.append(
            f'_base = LazyConfig.load(os.path.join(_dir, "{depth_up}common/models/ape_deta.py"))'
        )
        lines.append("from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid")
        lines.append("")
        lines.append("model = _base.model")
        mlp = spec["mlp"]
        mlp_kw = (
            'mlp_type="gelu",' if mlp == "gelu" else "subln=True, swiglu_subln=True,"
        )
        lines.append(
            "model.backbone = L(SimpleFeaturePyramid)(\n"
            "    net=L(EVAViT)(\n"
            f"        img_size={t['lsj']},\n"
            "        patch_size=16,\n"
            f"        embed_dim={spec['embed_dim']},\n"
            f"        depth={spec['depth']},\n"
            f"        num_heads={spec['num_heads']},\n"
            f"        window_size={spec['window_size']},\n"
            f"        window_block_indexes=tuple(\n"
            f"            i for i in range({spec['depth']}) if (i + 1) % {spec['every']} != 0\n"
            "        ),\n"
            f"        rope={spec['rope']},\n"
            f"        use_rel_pos={spec['rel_pos']},\n"
            f"        {mlp_kw}\n"
            "        pretrain_img_size=224,\n"
            "    ),\n"
            "    out_channels=256,\n"
            ")"
        )
        vit_layers, lang_kind = spec["depth"], None

    if t["vlf"]:
        lines += [
            "model.transformer.encoder.vl_fusion = True",
            "model.transformer.encoder.vl_embed_dim = 2048",
            "model.transformer.encoder.vl_init_values = 1.0 / 6",
            "model.transformer.encoder.use_act_checkpoint = True",
        ]
    if family in ("deformable_deta", "deformable_detr"):
        # closed-vocabulary: learned class bank replaces the text encoder
        lines.append(f"model.num_learned_classes = {eval_nc}")
        lang_kind = None
    if t["mp"]:
        lines.append("# _mp: proposal-ambiguous first-stage select (reference _mp configs)")
        lines.append("model.transformer.decoder.proposal_ambiguous = 1")
    if taskdir.endswith("Detection") and family != "ape_deta":
        lines.append("model.mask_on = False")

    # ---- data ----
    lines += [
        "",
        f'_data = LazyConfig.load(os.path.join(_dir, "{depth_up}common/data/{data_stem}.py"))',
        "dataloader = _data.dataloader",
    ]

    # ---- criteria ----
    tags = groups_for_data(data_stem)
    losses_note = ""
    if len(tags) <= 1:
        nc = GROUP_INFO[tags[0]][0] if tags else eval_nc
        lines += ["", "criterion = _base.criterion", f"criterion.num_classes = {nc}"]
        fed = tags and GROUP_INFO[tags[0]][2] and tags[0].startswith("lvis")
        if fed:
            lines += [
                "criterion.use_fed_loss = True",
                "criterion.fed_loss_num_classes = 50",
                f'criterion.fed_loss_cls_weights = L(fed_loss_cls_weights)(dataset="lvis_v1_train")',
            ]
            if tags[0] == "lviscoco":
                lines.append('criterion.fed_loss_pad_type = "cat"')
        if t["iouloss"]:
            lines += [
                "# _iouloss: enc-stage IoU losses (reference _iouloss_lp configs)",
                'criterion.losses = list(criterion.losses) + ["pred_ious", "anchor_ious"]',
                "criterion.weight_dict = dict(criterion.weight_dict)",
                'criterion.weight_dict["loss_pred_ious"] = 1.0',
                'criterion.weight_dict["loss_anchor_ious"] = 1.0',
            ]
        ncrit = 1
    else:
        lines += ["", "criterions = []"]
        lines.append(f"_TAGS = {tags!r}")
        lines.append("_INFO = {")
        for tag in sorted(set(tags)):
            nc, ratio, fedw = GROUP_INFO[tag]
            lines.append(f"    {tag!r}: ({nc}, {fedw!r}),")
        lines.append("}")
        lines.append(
            "for _tag in _TAGS:\n"
            "    _nc, _fedw = _INFO[_tag]\n"
            "    c = _base.criterion.clone()\n"
            "    c.num_classes = _nc\n"
            "    if _fedw is not None:\n"
            "        c.use_fed_loss = True\n"
            "        c.fed_loss_num_classes = 50\n"
            "        c.fed_loss_cls_weights = L(fed_loss_cls_weights)(dataset=_fedw)\n"
            '        if _tag == "lviscoco":\n'
            '            c.fed_loss_pad_type = "cat"\n'
            '    if _tag in ("vg", "gqa", "phrasecut", "flickr"):\n'
            "        c.weight_dict = dict(c.weight_dict)\n"
            '        c.weight_dict["loss_class_enc"] = 0.0\n'
            '    if _tag == "sa1b":\n'
            "        c.weight_dict = dict(c.weight_dict)\n"
            '        c.weight_dict["loss_class"] = 0.0\n'
            "    criterions.append(c)\n"
            "criterion = criterions[0]"
        )
        ncrit = len(tags)

    # ---- language ----
    if t["bert"]:
        lang_kind = "bert"
    if t["llama2"]:
        lang_kind = "llama2"
    if lang_kind:
        lines += ["", LANG[lang_kind]]
        if lang_kind == "llama2":
            lines += ["model.embed_dim_language = 4096",
                      "model.transformer.encoder.embed_dim_language = 4096"]
        elif lang_kind == "bert":
            lines += ["model.embed_dim_language = 768",
                      "model.transformer.encoder.embed_dim_language = 768"]

    # ---- optimizer / train ----
    # reference recipe facts win over the stem heuristics (ref_facts.json)
    facts = FACTS.get(relpath, {})
    max_iter, milestones = SCHEDULES.get(t["sched"] or "", (90000, [75000, 90000]))
    max_iter = facts.get("max_iter", max_iter)
    milestones = facts.get("milestones", milestones)
    eval_period = facts.get("eval_period", 20000)
    bs = t["bs"] or 16
    wd = 0.05 if (t["bb"] or "r50") != "r50" else 1e-4
    opt_extra = "    backbone_lr_mult=0.1,\n" if t["bb"] in (None, "r50") else ""
    lines += [
        "",
        "optimizer = dict(",
        "    base_lr=2e-4,",
        f"    weight_decay={wd},",
        "    grad_clip=0.1,",
        f"    vit_num_layers={vit_layers},",
        f"    layer_decay={0.8 if vit_layers else 1.0},",
        opt_extra + f"    milestones={milestones!r},",
        "    warmup_steps=2000,",
        ")",
    ]
    text_dim = 4096 if lang_kind == "llama2" else (768 if lang_kind == "bert" else 1024)
    ratios = [GROUP_INFO[tag][1] for tag in tags]
    prompts = None  # prompts ride on the data config's groups
    lines += [
        "",
        "train = dict(",
        f'    output_dir="./output/{stem}",',
        f"    max_iter={max_iter},",
        "    checkpoint_period=5000,",
        "    log_period=20,",
        f"    eval_period={eval_period},",
        f"    iter_size={t['iter_size']},",
        "    ema_decay=0.0,",
        '    init_checkpoint="",',
        "    seed=0,",
        "    fast_dev_run=dict(enabled=False),",
        f"    image_size={t['lsj']},",
        f"    num_text={num_text},",
        f"    text_dim={text_dim},",
    ]
    if len(tags) > 1:
        lines.append(f"    dataset_ratio={ratios!r},")
    if t["fsdp"]:
        lines.append("    fsdp=2,  # fsdp axis size; raise on real pods (reference FULL_SHARD)")
    lines.append(")")

    # eval-suite override (reference *_eval_odinw13/35/seginw variants swap
    # only the test list)
    if t["eval_suite"]:
        suite_data = {
            "odinw13": "odinw13_instance_lsj1024",
            "odinw35": "odinw35_instance_lsj1024",
            "seginw": "seginw_instance_lsj1024",
        }[t["eval_suite"]]
        lines += [
            "",
            f'_suite = LazyConfig.load(os.path.join(_dir, "{depth_up}common/data/{suite_data}.py"))',
            'dataloader = dict(dataloader)',
            'dataloader["tests"] = _suite.dataloader["tests"]',
        ]

    # ---- reference recipe facts (override the stem heuristics) ----
    fact_lines = []
    if "num_classes" in facts:
        fact_lines.append(f"model.num_classes = {facts['num_classes']}")
    for flag in ("instance_on", "semantic_on", "panoptic_on"):
        if flag in facts:
            fact_lines.append(f'train["{flag}"] = {facts[flag]}')
    if "select_box_nums_for_evaluation" in facts:
        fact_lines.append(
            f'train["select_box_nums_for_evaluation"] = '
            f"{facts['select_box_nums_for_evaluation']}"
        )
    if "name_prompt_fusion_type" in facts:
        fact_lines.append(
            f'train["name_prompt_fusion_type"] = "{facts["name_prompt_fusion_type"]}"'
        )
    crit_nc = facts.get("criterion_num_classes")
    if crit_nc and facts.get("criterion_num_classes_prefix"):
        # only criterion[0] pinned by the reference file; drop an inherited
        # fed-loss arm whose count table no longer fits (see repin note below)
        fact_lines += [
            f"if criterion.get('use_fed_loss', False) and {crit_nc[0]} < "
            '{"lvis_v1_train": 1203, "openimages_v6": 601}.get(',
            "    criterion.fed_loss_cls_weights.dataset, 0",
            "):",
            "    criterion.use_fed_loss = False",
            "    criterion.fed_loss_cls_weights = None",
            f"criterion.num_classes = {crit_nc[0]}",
        ]
        crit_nc = None
    if crit_nc:
        n = facts.get("num_criteria", len(crit_nc))
        crit_nc = (crit_nc * n)[:n] if len(crit_nc) == 1 else list(crit_nc)[:n]
        if len(set(crit_nc)) == 1 and len(crit_nc) > 3:
            lit = f"[{crit_nc[0]}] * {len(crit_nc)}"
        else:
            lit = repr(list(crit_nc))
        # the reference same-path files rebuild the criterion list with fed
        # loss DELETED, then re-arm only the entries whose count tables fit
        # (e.g. ..._cp_16x4_1080k.py:110-135) — so a re-pin must drop an
        # inherited fed-loss arm whose count table no longer fits the new
        # num_classes (table lengths: lvis_v1_train 1203, openimages_v6 601)
        repin = [
            '_FED_LEN = {"lvis_v1_train": 1203, "openimages_v6": 601}',
            "for _c, _nc in zip(criterions, _ref_crit_nc):",
            "    if _c.get('use_fed_loss', False) and _nc < _FED_LEN.get(",
            "        _c.fed_loss_cls_weights.dataset, 0",
            "    ):",
            "        _c.use_fed_loss = False",
            "        _c.fed_loss_cls_weights = None",
            "    _c.num_classes = _nc",
        ]
        if ncrit == 1:
            fact_lines += [
                f"_ref_crit_nc = {lit}",
                "criterions = [criterion.clone() for _ in _ref_crit_nc]",
            ] + repin + [
                "criterion = criterions[0]",
            ]
        else:
            fact_lines += [
                f"_ref_crit_nc = {lit}",
                "while len(criterions) < len(_ref_crit_nc):",
                "    _extra = criterions[0].clone()",
                "    _extra.use_fed_loss = False",
                "    _extra.fed_loss_cls_weights = None",
                "    criterions.append(_extra)",
            ] + repin
    if fact_lines:
        lines += [
            "",
            "# ---- recipe facts extracted from the reference config",
            "# (configs/ref_facts.json via tools/ref_config_facts.py — values only) ----",
        ] + fact_lines

    return "\n".join(lines) + "\n"


MODEL_SHIM = '''\
# Drop-in path shim: the reference keeps its base model config at
# configs/{relpath}; this repo's canonical copy lives in common/models/.
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../../common/models/{target}"))

model = _base.model
criterion = _base.criterion
'''


def main():
    # --regen: also rewrite existing AUTO-GENERATED files (identified by the
    # header line) so extracted reference facts propagate. Hand-written
    # configs are never touched.
    regen = "--regen" in sys.argv
    missing = []
    for dirpath, _, files in os.walk(REF):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), REF)
            if rel.startswith("common/"):
                continue
            out = os.path.join(ROOT, rel)
            if not os.path.exists(out):
                missing.append(rel)
            elif regen and "/models/" not in rel:
                with open(out) as f:
                    if f.readline().startswith("# Auto-generated task config"):
                        missing.append(rel)
    missing.sort()
    if "--list" in sys.argv:
        print("\n".join(missing))
        return

    written, skipped = 0, []
    for rel in missing:
        out = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        base = os.path.basename(rel)
        if "/models/" in rel:
            target = "ape_deta_r50.py" if "r50" in base else "ape_deta.py"
            with open(out, "w") as f:
                f.write(MODEL_SHIM.format(relpath=rel, target=target))
            written += 1
            continue
        taskdir = rel.split("/")[0]
        if taskdir not in DIRS:
            skipped.append(rel)
            continue
        stem = os.path.splitext(base)[0]
        t = parse_stem(stem)
        if t["bb"] is None and "r50" not in stem:
            skipped.append(rel)
            continue
        try:
            src = render(rel)
        except KeyError as e:
            skipped.append(f"{rel} ({e})")
            continue
        with open(out, "w") as f:
            f.write(src)
        written += 1
    print(f"wrote {written}; skipped {len(skipped)}")
    for s in skipped:
        print("SKIP", s)


if __name__ == "__main__":
    main()
