# ODinW-13 suite eval: per-dataset AP + mean/median aggregation (reference:
# configs/ODinW_Detection/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_13.py).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR
from ape_tpu.data.datasets.builtin import ODINW_13_TEST

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(
    os.path.join(_dir, "../../LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py")
)
model = _base.model
criterion = _base.criterion
optimizer = _base.optimizer
language = _base.language
train = _base.train
train.output_dir = "./output/eval_odinw13"

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name=n,
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        )
        for n in ODINW_13_TEST
    ],
)
