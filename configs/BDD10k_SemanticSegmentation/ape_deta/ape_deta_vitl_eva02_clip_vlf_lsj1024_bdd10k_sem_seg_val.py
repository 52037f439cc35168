# BDD10k_SemanticSegmentation eval (mIoU)
# (reference: configs/BDD10k_SemanticSegmentation/ape_deta/*)
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(
    os.path.join(_dir, "../../LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py")
)
model = _base.model

# the reference counterpart sets transformer.proposal_ambiguous = 1 (argmax
# over duplicated enc-stage heads at the first-stage select)
model.transformer.decoder.proposal_ambiguous = 1
criterion = _base.criterion
optimizer = _base.optimizer
language = _base.language
train = _base.train
train.output_dir = "./output/eval_bdd10k_semanticsegmentation"
train.num_text = 64

dataloader = dict(
    train=dict(dataset_names=[], mapper=None, batch_size=1),
    tests=[
        dict(
            dataset_name="bdd10k_sem_seg_val",
            mapper=L(DatasetMapperDETR)(is_train=False, image_size=1024),
            evaluator_type="sem_seg",
        ),
    ],
)
