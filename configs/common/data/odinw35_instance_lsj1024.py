# Auto-generated data config mirroring the reference configs/common/data/odinw35_instance_lsj1024.py
# (this repo's group schema; LSJ at the stated size stands in for the
# reference's multi-scale ResizeShortestEdge in the non-lsj variants —
# fixed square shapes are the TPU-native input contract).
from ape_tpu.config import L
from ape_tpu.data.mapper import DatasetMapperDETR

image_size = 1024

# the reference's exact test-dataset order (protocol tables align by index)
_names = [
    'odinw_AerialMaritimeDrone_large_test',
    'odinw_AerialMaritimeDrone_tiled_test',
    'odinw_AmericanSignLanguageLetters_American_Sign_Language_Letters.v1-v1.coco_test',
    'odinw_Aquarium_Aquarium_Combined.v2-raw-1024.coco_test',
    'odinw_BCCD_BCCD.v3-raw.coco_test',
    'odinw_boggleBoards_416x416AutoOrient_export_test',
    'odinw_brackishUnderwater_960x540_test',
    'odinw_ChessPieces_Chess_Pieces.v23-raw.coco_test',
    'odinw_CottontailRabbits_test',
    'odinw_dice_mediumColor_export_test',
    'odinw_DroneControl_Drone_Control.v3-raw.coco_test',
    'odinw_EgoHands_generic_test',
    'odinw_EgoHands_specific_test',
    'odinw_HardHatWorkers_raw_test',
    'odinw_MaskWearing_raw_test',
    'odinw_MountainDewCommercial_test',
    'odinw_NorthAmericaMushrooms_North_American_Mushrooms.v1-416x416.coco_test',
    'odinw_openPoetryVision_512x512_test',
    'odinw_OxfordPets_by-breed_test',
    'odinw_OxfordPets_by-species_test',
    'odinw_Packages_Raw_test',
    'odinw_PascalVOC_val',
    'odinw_pistols_export_test',
    'odinw_PKLot_640_test',
    'odinw_plantdoc_416x416_test',
    'odinw_pothole_test',
    'odinw_Raccoon_Raccoon.v2-raw.coco_test',
    'odinw_selfdrivingCar_fixedLarge_export_test',
    'odinw_ShellfishOpenImages_raw_test',
    'odinw_ThermalCheetah_test',
    'odinw_thermalDogsAndPeople_test',
    'odinw_UnoCards_raw_test',
    'odinw_VehiclesOpenImages_416x416_test',
    'odinw_websiteScreenshots_test',
    'odinw_WildfireSmoke_test',
]

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

# Per-dataset eval protocol (reference odinw35_instance_lsj1024.py: dataloader.name_prompt_fusion_text
# / select_box_nums_for_evaluation_list), consumed by the eval wrapper at
# set_eval_dataset time (deformable_detr.py:195-196, segm_vl.py:342-360).
dataloader["name_prompt_fusion_text"] = [True, False, True, True, True, True, True, True, False, False, True, False, False, True, True, True, True, True, True, True, True, False, False, False, True, True, True, True, False, False, True, True, False, True, True]
dataloader["select_box_nums_for_evaluation_list"] = [300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 300, 1, 300, 300, 300, 300, 300, 300, 300, 300]
