#!/bin/bash
# Latency protocol (reference: scripts/eval_time.sh — timed eval at
# num_classes in {1,128,1280}, segmentation off, on the real chip).
set -e
for N in 1 128 1280; do
  BENCH_TEXT=$N BENCH_ITERS=8 python bench.py
done
