# Flagship multi-dataset recipe with the language tower swapped to a frozen
# Llama-2-7b (hidden 4096) and average text-feature reduction.
#
# Capability match: /root/reference/configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B
# _REFCOCO_GQA_PhraseCut_Flickr30k/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024
# _cp_16x4x270k_mdl_llama2.py:35-45 — model_language = Llama2(
# meta-llama/Llama-2-7b-hf), embed_dim_language = 4096,
# text_feature_reduce_type = "average".
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_cfg = LazyConfig.load(
    os.path.join(_dir, "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_16x4_1080k_mdl.py")
)

model = _cfg.model
model.embed_dim_language = 4096
model.transformer.encoder.embed_dim_language = 4096

criterions = _cfg.criterions
criterion = _cfg.criterion
dataloader = _cfg.dataloader
optimizer = _cfg.optimizer

# HF tower, loaded from a local path (no egress in this image); the wrapper is
# ape_tpu/modeling/text/hf_wrappers.py::Llama2
language = dict(
    kind="llama2",
    model_name_or_path=os.environ.get(
        "LLAMA2_PATH", "models/meta-llama/Llama-2-7b-hf/"
    ),
)

train = _cfg.train
train["output_dir"] = "./output/ape_deta_vitl_mdl_llama2"
train["text_dim"] = 4096

# recorded class budget + task routing flags (reference config sets
# model_vision.num_classes=1256, instance_on/semantic_on True, panoptic_on False)
model.num_classes = 1256
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = False
