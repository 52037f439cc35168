# Auto-generated data config mirroring the reference configs/common/data/roboflow100_instance_lsj1024.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

from ape_tpu.data.catalog import DatasetCatalog

_names = sorted(n for n in DatasetCatalog.list() if n.startswith("rf100_"))

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

# Per-dataset eval protocol (reference roboflow100_instance_lsj1024.py: dataloader.name_prompt_fusion_text
# / select_box_nums_for_evaluation_list), consumed by the eval wrapper at
# set_eval_dataset time (deformable_detr.py:195-196, segm_vl.py:342-360).
dataloader["name_prompt_fusion_text"] = [True] * len(_names)
dataloader["select_box_nums_for_evaluation_list"] = [300] * len(_names)
