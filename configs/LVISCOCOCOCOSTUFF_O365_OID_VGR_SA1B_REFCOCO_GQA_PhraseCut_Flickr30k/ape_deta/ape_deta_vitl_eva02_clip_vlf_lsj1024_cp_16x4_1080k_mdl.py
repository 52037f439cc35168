# APE-L_D flagship multi-dataset training config.
#
# Capability match: /root/reference/configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B
# _REFCOCO_GQA_PhraseCut_Flickr30k/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024
# _cp_16x4_1080k_mdl.py — 9 train dataloaders with ratio-weighted choice,
# 10 per-dataset criteria (num_classes [1256,365,601,256,1,256,256,256,256,256]),
# per-dataset prompts name/phrase/expression, iter_size 4, 1.08M iters with a
# 900k milestone and 2k warmup, fed loss on LVIS+Stuff and OpenImages.
import os

from ape_tpu.config import L, LazyConfig
from ape_tpu.data.mapper import DatasetMapperDETR
from ape_tpu.data.datasets.metadata import fed_loss_cls_weights

_dir = os.path.dirname(__file__)
_base = LazyConfig.load(os.path.join(_dir, "../../common/models/ape_deta.py"))
_bb = LazyConfig.load(os.path.join(_dir, "../../common/backbone/vitl_eva02_clip.py"))

model = _base.model
model.backbone = _bb.backbone
model.transformer.encoder.vl_fusion = True
model.transformer.encoder.vl_embed_dim = 2048
model.transformer.encoder.vl_init_values = 1.0 / 6
model.transformer.encoder.use_act_checkpoint = True
model.transformer.decoder.use_act_checkpoint = True

# the reference counterpart sets transformer.proposal_ambiguous = 1 (argmax
# over duplicated enc-stage heads at the first-stage select)
model.transformer.decoder.proposal_ambiguous = 1

# one criterion per dataset group + the shared-eval extra (reference :114-118)
_NUM_CLASSES = [1256, 365, 601, 256, 1, 256, 256, 256, 256, 256]
criterions = []
for _i, _nc in enumerate(_NUM_CLASSES):
    c = _base.criterion.clone()
    c.num_classes = _nc
    if _i in (0, 2):  # LVIS+Stuff, OpenImages: federated loss (:120-132)
        c.use_fed_loss = True
        c.fed_loss_num_classes = 50
        c.fed_loss_pad_type = "cat"
        # count-table weights; "cat" pads LVIS 1203 -> 1256 with the stuff
        # classes always kept in the federated subset
        c.fed_loss_cls_weights = L(fed_loss_cls_weights)(
            dataset="lvis_v1_train" if _i == 0 else "openimages_v6"
        )
    if _i in (3, 6, 7, 8):  # region/phrase groups: no enc class loss (:134-160)
        c.weight_dict = dict(c.weight_dict)
        c.weight_dict["loss_class_enc"] = 0.0
    if _i == 4:  # SA-1B: class-agnostic, no class losses (:141-143)
        c.weight_dict = dict(c.weight_dict)
        c.weight_dict["loss_class"] = 0.0
    criterions.append(c)
criterion = criterions[0]

language = dict(
    width=1024,
    heads=16,
    layers=24,
    output_dim=1024,
    bpe_path=os.environ.get("CLIP_BPE_PATH", ""),
    max_batch_size=256,
)

optimizer = dict(
    base_lr=2e-4,
    weight_decay=0.05,
    grad_clip=0.1,
    vit_num_layers=24,
    layer_decay=0.8,
    milestones=[900000],
    warmup_steps=2000,
)

train = dict(
    output_dir="./output/ape_deta_vitl_mdl",
    max_iter=1080000,
    checkpoint_period=5000,
    log_period=20,
    eval_period=1080000,
    iter_size=4,
    ema_decay=0.0,
    init_checkpoint="",
    seed=0,
    fast_dev_run=dict(enabled=False),
    image_size=1024,
    num_text=1280,  # padded text tile (LVIS+stuff 1256 max)
    text_dim=1024,
    dataset_ratio=[1, 1, 1, 1, 1, 0.1, 0.1, 0.1, 0.1],
    dataset_prompts=[
        "name", "name", "name", "phrase", "name",
        "phrase", "phrase", "phrase", "phrase", "expression",
    ],
)


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
            _group(["lvis_v1_train+coco", "coco_2017_train_panoptic_stuffonly"],
                   sampler="RepeatFactorTrainingSampler", copypaste_prob=0.5),
            _group(["objects365_train_fixname"]),
            _group(["openimages_v6_train_bbox_nogroup"],
                   sampler="RepeatFactorTrainingSampler"),
            _group(["visualgenome_77962_box_and_region"], prompt="phrase"),
            _group(["sa1b_1m"], prompt="name", filter_empty=False),
            _group(["refcoco-mixed_group-by-image"], prompt="phrase"),
            _group(["gqa_region_train"], prompt="phrase"),
            _group(["phrasecut_train"], prompt="phrase"),
            _group(["flickr30k_separateGT_train"], prompt="phrase"),
        ],
    ),
    tests=[],
)

# recorded class budget + task routing flags (reference config sets
# model_vision.num_classes=1256, instance_on/semantic_on True, panoptic_on False)
model.num_classes = 1256
train["instance_on"] = True
train["semantic_on"] = True
train["panoptic_on"] = False
