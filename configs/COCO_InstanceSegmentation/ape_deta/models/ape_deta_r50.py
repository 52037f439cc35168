# Drop-in path shim: the reference keeps its base model config at
# configs/COCO_InstanceSegmentation/ape_deta/models/ape_deta_r50.py; this repo's canonical copy lives in common/models/.
import os

from ape_tpu.config import LazyConfig

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../../common/models/ape_deta_r50.py"))

model = _base.model
criterion = _base.criterion
