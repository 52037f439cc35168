# Auto-generated data config mirroring the reference configs/common/data/odinw13_instance.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

from ape_tpu.data.datasets.builtin import ODINW_13_TEST as _names

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name=n,
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
            evaluator_type=None,
        )
        for n in _names
    ],
)
