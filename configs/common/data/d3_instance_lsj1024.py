# Auto-generated data config mirroring the reference configs/common/data/d3_instance_lsj1024.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

_names = ["d3_inter_scenario", "d3_intra_scenario"]

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name=n,
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
            evaluator_type="d3",
        )
        for n in _names
    ],
)

# Per-dataset eval protocol (reference D3_InstanceSegmentation configs set
# model.model_vision.select_box_nums_for_evaluation_list = [300]).
dataloader["select_box_nums_for_evaluation_list"] = [300] * len(dataloader["tests"])
