#!/bin/bash
# Round-3 session-4 TPU pipeline, fired the moment the worker recovers:
#   0. fused-shape kernel validation on the real rope/granular scenes
#   1. granular sequential campaign (bucketed caps + compile cache)
#   2. cloth batch-4 campaign (fresh seeds)
#   3. final phase: trainings + rollouts + planning acceptance + bench
# Budgets are absolute deadlines so a late start shrinks the campaigns,
# never the final phase.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session4.log
NOW=$(date +%s)
# final phase needs ~5h (3 trainings + 2 plans + bench); work backward
# from the session budget passed as SESSION_END (epoch) or now+10h
SESSION_END=${SESSION_END:-$((NOW + 36000))}
FINAL_BUDGET=${FINAL_BUDGET:-18000}
CLOTH_BUDGET=${CLOTH_BUDGET:-4800}
FINAL_START=$((SESSION_END - FINAL_BUDGET))
CLOTH_START=$((FINAL_START - CLOTH_BUDGET))

echo "[s4] start $(date); final phase at $(date -d @$FINAL_START 2>/dev/null)" >> $LOG

echo "[s4] phase 0: fused-shape validation $(date)" >> $LOG
timeout 2400 python scripts/bench_real_scenes.py \
  rope rope:fused_shapes granular:fused_shapes \
  > /tmp/bench_fused.log 2>&1
echo "[s4] phase 0 rc=$? $(date)" >> $LOG

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[s4] phase 1: granular campaign until $(date -d @$CLOTH_START 2>/dev/null)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-331} GRAN_N=${GRAN_N:-16} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[s4] phase 1 done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  # size the cloth campaign to the time actually left (one batch ~40 min)
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s4] phase 2: cloth campaign, $n episodes $(date)" >> $LOG
  CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n bash scripts/run_cloth_campaign.sh
  echo "[s4] phase 2 done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s4] phase 3: final phase $(date)" >> $LOG
bash scripts/final_phase_r3.sh
echo "[s4] ALL DONE $(date)" >> $LOG
