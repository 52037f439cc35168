from .coco_eval import COCOEvaluator, box_iou_xyxy, mask_iou
from .d3_eval import D3Evaluator
from .eval_runner import evaluate_dataset, paste_masks
from .lvis_eval import LVISEvaluator
from .oid_eval import OIDEvaluator, build_ancestors
from .other_evals import (
    PanopticEvaluator,
    RefCOCOEvaluator,
    SemSegEvaluator,
    aggregate_benchmark_suite,
)
from .panoptic_merge import panoptic_merge
from .unified_eval import UnifiedEvaluator, build_map_back, build_map_back_novel
