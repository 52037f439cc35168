# Auto-generated data config mirroring the reference configs/common/data/odinw35_instance.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

# the reference evaluates odinw35 on the _test splits (PascalVOC on _val);
# pick per-group: _test when present, else _val
from ape_tpu.data.datasets import metadata as M

_names = sorted(
    next(
        (k for k in group if k.endswith("_test")),
        next((k for k in group if k.endswith("_val")), None),
    )
    for group in M.odinw_splits().values()
)

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
