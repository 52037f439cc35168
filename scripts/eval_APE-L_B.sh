#!/bin/bash
# Per-benchmark eval sweep for an APE-L_B checkpoint (adds grounding suites).
set -e
CKPT=${1:?usage: eval_APE-L_B.sh <checkpoint>}
shift
for cfg in \
  configs/LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py \
  configs/LVISCOCOCOCOSTUFF_REFCOCO/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_refcoco.py \
  configs/D3_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_d3.py \
  configs/ADE20k_SemanticSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_ade20k.py \
; do
  python tools/train_net.py --config-file "$cfg" --eval-only \
    train.init_checkpoint="$CKPT" "$@"
done
