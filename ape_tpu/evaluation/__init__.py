from .coco_eval import COCOEvaluator, box_iou_xyxy, mask_iou
from .eval_runner import evaluate_dataset, paste_masks
from .other_evals import (
    PanopticEvaluator,
    RefCOCOEvaluator,
    SemSegEvaluator,
    aggregate_benchmark_suite,
)
from .panoptic_merge import panoptic_merge
