#!/bin/bash
# Round-3 chip A/B session: run once when the axon tunnel is up.
# Sequential (1-core host); logs to $LOG (default /tmp/chip_ab_r3.log).
# Measures the vp-space input modes (APE_MSDA_VP / APE_MSDA_BWD_VP) against
# the pre-shifted-planes defaults, at both bench-scale and realistic offsets,
# plus training throughput with the merged backward.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/chip_ab_r3.log}
: > "$LOG"
run() {
  echo "===== $* =====" | tee -a "$LOG"
  timeout 1200 "$@" 2>&1 | tail -40 | tee -a "$LOG"
}

# 1. headline bench, planes vs vp forward
run python bench.py
APE_MSDA_VP=1 run python bench.py

# 2. pair suite at realistic offsets, planes vs vp
OFF_SCALE=2.0 run python experiments/pair_suite.py
OFF_SCALE=2.0 APE_MSDA_VP=1 run python experiments/pair_suite.py

# 3. encoder fwd+bwd per layer (merged bwd default), planes vs vp both sides
OFF_SCALE=2.0 run python experiments/encoder_bwd_race.py pallas
OFF_SCALE=2.0 APE_MSDA_VP=1 APE_MSDA_BWD_VP=1 run python experiments/encoder_bwd_race.py pallas

# 4. training throughput @1024^2 (merged backward), defaults vs vp
run python tools/bench_train.py
APE_MSDA_VP=1 APE_MSDA_BWD_VP=1 run python tools/bench_train.py

echo "DONE" | tee -a "$LOG"
