# Auto-generated data config mirroring the reference configs/common/data/ade20k_panoptic_lsj1024.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

def _group(names, sampler="TrainingSampler", prompt="name", **kw):
    return dict(
        dataset_names=list(names),
        mapper=L(DatasetMapperDETR)(image_size=image_size, is_train=True),
        batch_size=16,
        sampler=sampler,
        prompt=prompt,
        **kw,
    )


dataloader = dict(
    train=_group(['ade20k_panoptic_train']),
    tests=[
        dict(dataset_name='ade20k_panoptic_val',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='panoptic'),
        dict(dataset_name='ade20k_sem_seg_val',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='sem_seg'),
    ],
)
