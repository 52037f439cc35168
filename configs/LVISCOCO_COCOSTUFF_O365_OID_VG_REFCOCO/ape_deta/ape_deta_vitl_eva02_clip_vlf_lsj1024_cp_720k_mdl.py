# LVIS+COCO merged vocabulary training variant
# Capability match: /root/reference/configs/LVISCOCO_COCOSTUFF_O365_OID_VG_REFCOCO/ape_deta/*_mdl.py —
# same group structure; see the flagship APE-L_D config for the full pattern.
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR

_dir = os.path.dirname(__file__)
_flag = LazyConfig.load(os.path.join(
    _dir,
    "../../LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k/"
    "ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_16x4_1080k_mdl.py",
))
model = _flag.model
criterions = [_flag.criterions[i] for i in [0, 1, 2, 3, 5, 9]]
criterion = criterions[0]
language = _flag.language
optimizer = _flag.optimizer
train = _flag.train
train.output_dir = "./output/lviscoco_cocostuff_o365_oid_vg_refcoco"
train.dataset_ratio = [1, 1, 1, 0.1, 0.1]
train.dataset_prompts = ['name', 'name', 'name', 'phrase', 'phrase', 'name']


def _group(names, sampler="TrainingSampler", prompt="name", **kw):
    return dict(
        dataset_names=list(names),
        **kw,
        mapper=L(DatasetMapperDETR)(image_size=1024, is_train=True),
        batch_size=16,
        sampler=sampler,
        prompt=prompt,
    )


dataloader = dict(
    train=dict(
        groups=[
            _group(['lvis_v1_train+coco', 'coco_2017_train_panoptic_stuffonly'], sampler='RepeatFactorTrainingSampler', prompt='name', copypaste_prob=0.5),
            _group(['objects365_train_fixname'], sampler='TrainingSampler', prompt='name'),
            _group(['openimages_v6_train_bbox_nogroup'], sampler='RepeatFactorTrainingSampler', prompt='name'),
            _group(['visualgenome_77962_box_and_region'], sampler='TrainingSampler', prompt='phrase'),
            _group(['refcoco-mixed_group-by-image'], sampler='TrainingSampler', prompt='phrase'),
        ],
    ),
    tests=[],
)
