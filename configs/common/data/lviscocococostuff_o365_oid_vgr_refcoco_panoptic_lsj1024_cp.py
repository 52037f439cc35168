# Auto-generated data config mirroring the reference configs/common/data/lviscocococostuff_o365_oid_vgr_refcoco_panoptic_lsj1024_cp.py
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
    train=dict(groups=[
        _group(['lvis_v1_train+coco', 'coco_2017_train_panoptic_stuffonly'], sampler='RepeatFactorTrainingSampler', copypaste_prob=0.5),
        _group(['objects365_train_fixname']),
        _group(['openimages_v6_train_bbox_nogroup'], sampler='RepeatFactorTrainingSampler'),
        _group(['visualgenome_77962_box_and_region'], prompt='phrase'),
        _group(['refcoco-mixed'], prompt='expression'),
    ]),
    tests=[
        dict(dataset_name='lvis_v1_val',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='lvis', iou_types=('bbox', 'segm')),
        dict(dataset_name='coco_2017_val_panoptic_stuffonly',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='sem_seg'),
        dict(dataset_name='objects365_val_fixname',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='coco', iou_types=('bbox',)),
        dict(dataset_name='openimages_v6_val_bbox',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='oid', iou_types=('bbox',)),
        dict(dataset_name='refcoco-unc-val',
             mapper=L(DatasetMapperDETR)(is_train=False, image_size=image_size),
             evaluator_type='refcoco'),
    ],
)
