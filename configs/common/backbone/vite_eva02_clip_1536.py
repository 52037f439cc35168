# EVA-02-CLIP ViT-E at LSJ 1536 (reference: configs/common/backbone/
# vite_eva02_clip_1536.py — img/pad 1536, else as 1024).
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "vite_eva02_clip_1024.py"))

backbone = _base.backbone
backbone.net.img_size = 1536
