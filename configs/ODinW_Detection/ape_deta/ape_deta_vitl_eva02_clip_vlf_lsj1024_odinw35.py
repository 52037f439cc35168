# ODinW-35 suite eval (one eval split per dataset)
# (reference: configs/ODinW_Detection/ape_deta/*)
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
train.output_dir = "./output/eval_odinw_detection"


dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name="odinw_AerialMaritimeDrone_large_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_AerialMaritimeDrone_tiled_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_AmericanSignLanguageLetters_American_Sign_Language_Letters.v1-v1.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_Aquarium_Aquarium_Combined.v2-raw-1024.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_BCCD_BCCD.v3-raw.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_ChessPieces_Chess_Pieces.v23-raw.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_CottontailRabbits_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_DroneControl_Drone_Control.v3-raw.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_EgoHands_generic_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_EgoHands_specific_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_HardHatWorkers_raw_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_MaskWearing_raw_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_MountainDewCommercial_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_NorthAmericaMushrooms_North_American_Mushrooms.v1-416x416.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_OxfordPets_by-breed_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_OxfordPets_by-species_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_PKLot_640_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_Packages_Raw_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_PascalVOC_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_Raccoon_Raccoon.v2-raw.coco_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_ShellfishOpenImages_raw_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_ThermalCheetah_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_UnoCards_raw_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_VehiclesOpenImages_416x416_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_WildfireSmoke_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_boggleBoards_416x416AutoOrient_export_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_brackishUnderwater_960x540_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_dice_mediumColor_export_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_openPoetryVision_512x512_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_pistols_export_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_plantdoc_100x100_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_plantdoc_416x416_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_pothole_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_selfdrivingCar_fixedLarge_export_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_thermalDogsAndPeople_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
        dict(
            dataset_name="odinw_websiteScreenshots_test",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
        ),
    ],
)
