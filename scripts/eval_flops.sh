#!/bin/bash
# FLOPs protocol (reference: scripts/eval_flops.sh via fvcore; here via XLA
# cost analysis).
set -e
CFG=${1:-configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitt_eva02_lsj1024_12ep.py}
python tools/analyze_model.py --config-file "$CFG" --tasks parameter,flop "$@"
