# COCO instance-segmentation data config with LSJ 1024 (reference:
# configs/common/data/coco_instance_lsj1024*.py — ResizeScale 0.1-2.0 + FixedSizeCrop).
import os

from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

_root = os.environ.get("DETECTRON2_DATASETS", "datasets")

dataloader = dict(
    train=dict(
        dataset_names=["coco_2017_train"],
        mapper=L(DatasetMapperDETR)(
            is_train=True, image_size=1024, max_gt=100, mask_on=True, mask_size=256
        ),
        batch_size=2,
        sampler="TrainingSampler",
    ),
    tests=[
        dict(
            dataset_name="coco_2017_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        )
    ],
)

# dataset registration (auto-register under $DETECTRON2_DATASETS when present,
# matching the reference's ape/data/datasets convention)
from ape_tpu.data.catalog import DatasetCatalog
from ape_tpu.data.datasets.coco import register_coco_instances

for name, json_file, image_root in [
    ("coco_2017_train", "coco/annotations/instances_train2017.json", "coco/train2017"),
    ("coco_2017_val", "coco/annotations/instances_val2017.json", "coco/val2017"),
]:
    if name not in DatasetCatalog and os.path.exists(os.path.join(_root, json_file)):
        register_coco_instances(
            name, {}, os.path.join(_root, json_file), os.path.join(_root, image_root)
        )
