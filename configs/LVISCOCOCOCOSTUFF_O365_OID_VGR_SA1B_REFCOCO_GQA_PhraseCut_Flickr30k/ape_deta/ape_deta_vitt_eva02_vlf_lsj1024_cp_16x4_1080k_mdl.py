# APE-Ti flagship multi-dataset training config (EVA-02-Ti backbone).
#
# Capability match: /root/reference/configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B
# _REFCOCO_GQA_PhraseCut_Flickr30k/ape_deta/ape_deta_vitt_eva02_vlf_lsj1024
# _cp_16x4_1080k_mdl.py — the vitl mdl recipe with the 192-d/12-layer EVA-02-Ti
# backbone swapped in (reference :18-29); VL fusion dims are unchanged
# (embed_dim 2048, init_values 1/6 — reference :86-93), text tower stays the
# frozen EVA-CLIP-bigE 1024-d (reference :35-40).
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_cfg = LazyConfig.load(
    os.path.join(_dir, "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_16x4_1080k_mdl.py")
)
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitt_eva02.py"))

model = _cfg.model
model.backbone = _bb.backbone

criterions = _cfg.criterions
criterion = _cfg.criterion
language = _cfg.language
dataloader = _cfg.dataloader

optimizer = _cfg.optimizer
optimizer["vit_num_layers"] = 12

train = _cfg.train
train["output_dir"] = "./output/ape_deta_vitt_mdl"

# recorded class budget + task routing flags (reference config sets
# model_vision.num_classes=1256, instance_on/semantic_on True, panoptic_on False)
model.num_classes = 1256
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = False
