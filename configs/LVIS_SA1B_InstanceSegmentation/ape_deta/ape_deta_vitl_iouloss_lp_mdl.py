# LVIS + SA-1B with IoU-regression proposal scoring.
# Capability match: /root/reference/configs/LVIS_SA1B_InstanceSegmentation/
# ape_deta/ape_deta_r50_50ep_iouloss_lp.py — adds the enc-stage "pred_iou" MSE
# loss (criterion[0].losses += ["pred_iou"], weight loss_iou=1.0) with the
# localisation-only stage assigners; reference pre-NMS topk 1000 / enc NMS 0.9.
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(
    os.path.join(_dir, "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_360k_mdl.py")
)

model = _base.model
model.transformer.pre_nms_topk = 1000
model.transformer.nms_thresh_enc = 0.9

criterions = _base.criterions
c0 = criterions[0]
c0.losses = tuple(c0.losses) + ("pred_iou",)
c0.weight_dict = dict(c0.weight_dict)
c0.weight_dict["loss_iou"] = 1.0
criterion = criterions[0]

language = _base.language
optimizer = _base.optimizer
train = _base.train
train["output_dir"] = "./output/lvis_sa1b_iouloss_lp"
dataloader = _base.dataloader
