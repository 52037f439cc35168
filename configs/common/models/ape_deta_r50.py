# APE-DETA on a ResNet-50 backbone — the reference's base model tree
# (configs/COCO_InstanceSegmentation/ape_deta/models/ape_deta_r50.py:24-155:
# FrozenBN r50 freeze_at=1, detrex ChannelMapper res3-5 -> 5 levels via 3x3
# stride-2 extras, 900 queries, two-stage + box refine + assign_first_stage).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.modeling.ape_deta.model import ChannelMapper
from ape_tpu.modeling.backbone.resnet import ResNet

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "ape_deta.py"))

model = _base.model
model.backbone = L(ResNet)(
    depth=50,
    out_features=("res2", "res3", "res4", "res5"),
    freeze_at=1,
)
model.neck = L(ChannelMapper)(
    out_channels=256,
    in_features=("res3", "res4", "res5"),
    num_outs=5,
)
model.in_features = ("res3", "res4", "res5", "extra0", "extra1")
model.mask_in_feature = "res2"

criterion = _base.criterion

# optimizer note: the r50 family has no ViT — layerwise lr decay is a no-op
# (reference r50 configs keep the plain AdamW recipe); FrozenBN constants are
# stop_gradient'ed in the module and excluded via frozen_regex.
optimizer_frozen_regex = r"(stem_|norm\d|shortcut_norm|_norm)/(mean|var)"
