# Tiny end-to-end smoke on the ResNet-50 backbone path (r50 config family):
# full train loop at 64x64 with the real depth-50 net, res3-5 + stride-2
# extras neck, mask head on res2 — CPU-compilable in minutes.
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.modeling.ape_deta.model import ChannelMapper
from ape_tpu.modeling.backbone.resnet import ResNet

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "ape_deta_tiny.py"))

model = _base.model
model.backbone = L(ResNet)(depth=50, freeze_at=1)
model.neck = L(ChannelMapper)(
    out_channels=64, in_features=("res3", "res4", "res5"), num_outs=3
)
model.in_features = ("res3", "res4", "res5")
model.mask_in_feature = "res2"

criterion = _base.criterion

optimizer = dict(_base.optimizer)
optimizer.update(vit_num_layers=0, layer_decay=1.0, backbone_lr_mult=0.1)

train = _base.train
train.output_dir = "./output/tiny_smoke_r50"

dataloader = _base.dataloader
