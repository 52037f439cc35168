# Segmentation-in-the-Wild 25-dataset suite eval
# (reference: configs/SegInW_InstanceSegmentation/ape_deta/*)
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
train.output_dir = "./output/eval_seginw_instancesegmentation"


dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name="seginw_Airplane-Parts_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Bottles_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Brain-Tumor_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Chicken_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Cows_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Electric-Shaver_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Elephants_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Fruits_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Garbage_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Ginger-Garlic_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Hand-Metal_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Hand_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_House-Parts_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_HouseHold-Items_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Nutterfly-Squireel_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Phones_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Poles_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Puppies_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Rail_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Salmon-Fillet_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Strawberry_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Tablets_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Toolkits_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Trash_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="seginw_Watermelon_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
    ],
)
