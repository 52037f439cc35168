# COCO instance + SA-1B class-agnostic mix
# Capability match: /root/reference/configs/COCO_SA1B_InstanceSegmentation/ape_deta/*_mdl.py —
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
criterions = [_flag.criterions[i] for i in [4, 9]]
criterion = criterions[0]
language = _flag.language
optimizer = _flag.optimizer
train = _flag.train
train.output_dir = "./output/coco_sa1b_instancesegmentation"
train.dataset_ratio = [1, 1]
train.dataset_prompts = ['name', 'name', 'name']


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
            _group(['sa1b_1m'], sampler='TrainingSampler', prompt='name', filter_empty=False),
            _group(['coco_2017_train'], sampler='TrainingSampler', prompt='name'),
        ],
    ),
    tests=[],
)
