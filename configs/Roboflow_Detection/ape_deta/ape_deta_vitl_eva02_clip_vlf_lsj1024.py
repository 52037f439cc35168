# Roboflow-100 suite eval: one COCO-format test split per rf100 dataset,
# discovered by directory scan at registration time.
# Capability match: /root/reference/configs/Roboflow_Detection/ape_deta/
# ape_deta_vitl_eva02_clip_vlf_lsj1024.py (100 per-dataset tests on the
# APE-L_D model, name prompts, mean/median aggregation by eval_APE-L_D.sh).
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.catalog import DatasetCatalog
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(
    os.path.join(
        _dir,
        "../../LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py",
    )
)
model = _base.model
criterion = _base.criterion
optimizer = _base.optimizer
language = _base.language
train = _base.train
train.output_dir = "./output/eval_roboflow_detection"

# rf100 datasets exist only when $DETECTRON2_DATASETS/rf100/<name>/test is
# present; the registry scan already ran at import, so enumerate it
_rf_names = [n for n in DatasetCatalog.list() if n.startswith("rf100_")]

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name=n,
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="coco",
            suite="rf100",
        )
        for n in _rf_names
    ],
)

# ---- reference recipe facts (Roboflow_Detection config: 720k-iter schedule,
# 100 per-dataset criteria at num_classes=1000, class budget 1256, detection
# only) ----
train.max_iter = 720000
train.eval_period = 720000
train["instance_on"] = True
train["semantic_on"] = False
train["panoptic_on"] = False
train["select_box_nums_for_evaluation"] = 300
optimizer.milestones = [640000]
model.num_classes = 1256
# the reference deletes the inherited LVIS fed-loss arm before the 100-way
# clone (ape_deta_vitl_eva02_clip_vlf_lsj1024.py:25-35)
criterion.use_fed_loss = False
criterion.fed_loss_cls_weights = None
criterions = [criterion.clone() for _ in range(100)]
for _c in criterions:
    _c.num_classes = 1000
criterion = criterions[0]
