#!/bin/bash
# Per-benchmark eval sweep for one checkpoint (reference: scripts/eval_APE-L_D.sh
# — loop eval configs through train_net.py --eval-only).
set -e
CKPT=${1:?usage: eval_APE-Ti.sh <checkpoint>}
shift
for cfg in \
  configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitt_eva02_lsj1024_12ep.py \
; do
  python tools/train_net.py --config-file "$cfg" --eval-only \
    train.init_checkpoint="$CKPT" "$@"
done
