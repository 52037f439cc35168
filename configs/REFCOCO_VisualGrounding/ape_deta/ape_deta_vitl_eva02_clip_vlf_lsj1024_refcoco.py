# RefCOCO referring-expression grounding eval with the flagship model
# (reference: configs/REFCOCO_VisualGrounding/ape_deta/*): same model tree,
# swapped dataloader; P@0.5-0.9 evaluator.
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(
    os.path.join(_dir, "../../LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py")
)
model = _base.model
criterion = _base.criterion
optimizer = _base.optimizer
language = _base.language
train = _base.train
train.output_dir = "./output/eval_refcoco"

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name=n,
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="refcoco",
        )
        for n in ("refcoco-unc-val", "refcoco-unc-testA", "refcoco-unc-testB",
                  "refcocoplus-unc-val", "refcocog-umd-val")
    ],
)
