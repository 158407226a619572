#!/bin/bash
# Round-3 session-5 TPU pipeline (fresh checkout: gitignored episode data
# from earlier sessions is gone, so all three campaigns rerun here):
#   0. fused-shape kernel validation on the real rope/granular scenes
#   R. rope batch-8 campaign (cheapest data; top up to ~32 episodes)
#   1. granular sequential campaign (bucketed caps + compile cache)
#   2. cloth batch-4 campaign
#   3. final phase: trainings + rollouts + planning acceptance + bench
# Budgets are absolute deadlines so a late start shrinks the campaigns,
# never the final phase.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session5.log
NOW=$(date +%s)
SESSION_END=${SESSION_END:-$((NOW + 41400))}
FINAL_BUDGET=${FINAL_BUDGET:-18000}
CLOTH_BUDGET=${CLOTH_BUDGET:-4800}
GRAN_BUDGET=${GRAN_BUDGET:-9000}
FINAL_START=$((SESSION_END - FINAL_BUDGET))
CLOTH_START=$((FINAL_START - CLOTH_BUDGET))
GRAN_START=$((CLOTH_START - GRAN_BUDGET))

ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0; }
run_watched() {  # stall watchdog: rc 9 = killed after STALL_MIN idle minutes
  "$@" &
  local pid=$! last=0 still=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now; now=$(ticks "$pid")
    if [ "$now" -le "$((last + 30))" ]; then still=$((still + 1)); else still=0; fi
    last=$now
    if [ "$still" -ge "${STALL_MIN:-25}" ]; then
      echo "[watchdog] pid $pid stalled; killing $(date)" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

echo "[s5] start $(date); gran at $(date -d @$GRAN_START), cloth at $(date -d @$CLOTH_START), final at $(date -d @$FINAL_START)" >> $LOG

echo "[s5] phase 0: fused-shape validation $(date)" >> $LOG
timeout 2400 python scripts/bench_real_scenes.py \
  rope rope:fused_shapes granular:fused_shapes \
  > /tmp/bench_fused.log 2>&1
echo "[s5] phase 0 rc=$? $(date)" >> $LOG

# phase R: rope batch-8 until the granular deadline (batches of 8; a
# healthy batch is mostly host-idle like cloth, so a wide stall window)
base=${ROPE_BASE:-8}
while [ "$(date +%s)" -lt "$GRAN_START" ]; do
  echo "[s5] rope batch base $base start $(date)" >> $LOG
  STALL_MIN=25 run_watched timeout 4200 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/rope --n-episode 8 --batch 8 \
    --base "$base" --out data/sim_data >> /tmp/rope_batch.log 2>&1
  echo "[s5] rope batch base $base rc=$? $(date)" >> $LOG
  base=$((base + 8))
  [ "$base" -ge "${ROPE_MAX_BASE:-96}" ] && break
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[s5] phase 1: granular campaign until $(date -d @$CLOTH_START)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-331} GRAN_N=${GRAN_N:-16} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[s5] phase 1 done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s5] phase 2: cloth campaign, $n episodes $(date)" >> $LOG
  CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n bash scripts/run_cloth_campaign.sh
  echo "[s5] phase 2 done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s5] phase 3: final phase $(date)" >> $LOG
bash scripts/final_phase_r3.sh
echo "[s5] ALL DONE $(date)" >> $LOG
