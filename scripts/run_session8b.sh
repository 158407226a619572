#!/bin/bash
# Session-8 rebalance: rope finished ~2x faster than planned (compile cache
# + 360^2 renders), so granular would have started early and eaten cloth's
# window under run_session8.sh's fixed CLOTH_START. This runner replaces
# session8 from the granular phase on, giving cloth (the material with the
# worst r2 rollout error, 1.30) a full window:
#   granular (sequential, watchdog)   -> CLOTH_START 13:30
#   cloth (batch-4, watchdog)         -> FINAL_START 16:10
#   final_phase_r3.sh                 -> HARD_END 20:40
# Waits for the orphaned in-flight rope batch (WAIT_PID) before touching
# the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session8.log
CLOTH_START=${CLOTH_START:-1787059800} # 13:30 UTC
FINAL_START=${FINAL_START:-1787069400} # 16:10 UTC
HARD_END=${HARD_END:-1787085600}       # 20:40 UTC

if [ -n "${WAIT_PID:-}" ]; then
  echo "[s8b] waiting for in-flight rope batch pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[s8b] in-flight rope batch done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1

if [ "${PROFILE:-0}" = "1" ]; then
  # bounded frame-cost decomposition at the bench point — gives the PBD
  # lever data hours before the final phase instead of inside it
  echo "[s8b] frame-part profile $(date)" >> $LOG
  timeout 1200 python scripts/bench_frame_parts.py \
    > data/frame_parts_r3s8.log 2>&1
  echo "[s8b] profile rc=$? $(date)" >> $LOG
  timeout 600 python scripts/bench_frame_parts.py --tiles \
    >> data/frame_parts_r3s8.log 2>&1
  echo "[s8b] tile probe rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[s8b] granular campaign until $(date -d @$CLOTH_START)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-300} GRAN_N=${GRAN_N:-30} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[s8b] granular done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s8b] cloth campaign, $n episodes $(date)" >> $LOG
  GRAN_RETRY=0 CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n \
    bash scripts/run_cloth_campaign.sh
  echo "[s8b] cloth done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s8b] final phase $(date)" >> $LOG
HARD_END=$HARD_END bash scripts/final_phase_r3.sh
echo "[s8b] ALL DONE $(date)" >> $LOG
