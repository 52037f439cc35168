#!/bin/bash
# Per-benchmark eval sweep for an APE-L_C checkpoint (adds SegInW/panoptic).
set -e
CKPT=${1:?usage: eval_APE-L_C.sh <checkpoint>}
shift
for cfg in \
  configs/LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py \
  configs/LVISCOCOCOCOSTUFF_REFCOCO/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_refcoco.py \
  configs/SegInW_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_seginw.py \
  configs/COCO_PanopticSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_coco_panoptic.py \
; do
  python tools/train_net.py --config-file "$cfg" --eval-only \
    train.init_checkpoint="$CKPT" "$@"
done
