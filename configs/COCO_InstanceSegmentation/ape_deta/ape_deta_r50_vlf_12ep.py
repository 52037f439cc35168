# APE-DETA r50 + vision-language fusion, COCO 12ep (reference:
# configs/COCO_InstanceSegmentation/ape_deta/ape_deta_r50_vlf_12ep.py — the
# r50_12ep recipe with the VL-fused encoder: BiAttentionBlock embed 2048,
# layer-scale 1/6, text feature bank, name_prompt_fusion_type "zero").
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "ape_deta_r50_12ep.py"))

model = _base.model
model.transformer.encoder.vl_fusion = True
model.transformer.encoder.vl_embed_dim = 2048
model.transformer.encoder.vl_init_values = 1.0 / 6
model.transformer.encoder.use_act_checkpoint = True

criterion = _base.criterion
dataloader = _base.dataloader
language = _base.language
optimizer = _base.optimizer

train = _base.train
train.output_dir = "./output/ape_deta_r50_vlf_coco_12ep"
train.name_prompt_fusion_type = "zero"
train.text_feature_bank = True
