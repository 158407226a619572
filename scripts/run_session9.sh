#!/bin/bash
# Session-9 (short session, fresh VM again): the campaign data from s8 did
# not survive. With <1h of TPU time the priorities are driver-artifact
# robustness, not data scale:
#   1. bench.py full run  — validates the exact program the driver runs for
#      BENCH_r03.json and leaves the persistent compile cache warm.
#   2. plan_acceptance rope — replaces the r2-era data/plan_rope/stats.txt
#      (whose error INCREASES) with a decreasing-error + PPO-recovery run.
# Both timeout-bounded so no straggler holds the TPU when the driver's
# round-end bench starts.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session9.log
PLAN_END=${PLAN_END:-1787058900} # 13:15 UTC

echo "[s9] bench $(date)" >> $LOG
timeout 1320 python bench.py > /tmp/bench_r3s9.log 2>&1
echo "[s9] bench rc=$? $(date)" >> $LOG
bash scripts/tpu_watch.sh >> $LOG 2>&1

NOW=$(date +%s)
budget=$((PLAN_END - NOW))
if [ "$budget" -gt 300 ]; then
  echo "[s9] plan acceptance rope budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/plan_acceptance.py rope 10 20000 \
    > /tmp/plan_rope_r3s9.log 2>&1
  echo "[s9] plan rc=$? $(date)" >> $LOG
else
  echo "[s9] plan skipped (no budget) $(date)" >> $LOG
fi
echo "[s9] DONE $(date)" >> $LOG
