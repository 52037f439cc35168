#!/bin/bash
# Per-benchmark eval sweep for an APE-L_D checkpoint (reference:
# scripts/eval_APE-L_D.sh:14-39 — loop eval configs through --eval-only).
set -e
CKPT=${1:?usage: eval_APE-L_D.sh <checkpoint>}
shift
for cfg in \
  configs/LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py \
  configs/REFCOCO_VisualGrounding/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_refcoco.py \
  configs/ADE20k_SemanticSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_ade20k.py \
  configs/ODinW_Detection/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_odinw13.py \
; do
  python tools/train_net.py --config-file "$cfg" --eval-only \
    train.init_checkpoint="$CKPT" "$@"
done
