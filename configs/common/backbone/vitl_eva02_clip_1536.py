# EVA-02-CLIP ViT-L at LSJ 1536 (reference: configs/common/backbone/
# vitl_eva02_clip_1536.py — identical to vitl_eva02_clip but img/pad 1536).
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "vitl_eva02_clip.py"))

backbone = _base.backbone
backbone.net.img_size = 1536
