#!/bin/bash
# Round-3 final phase: retrain all three materials on the refreshed
# campaign data, rollout-eval each, run the full-scale planning acceptance
# (rope + granular), then the headline bench. Run AFTER killing any
# campaign process (only one process can hold the TPU).
#
# Every stage is budgeted backward from HARD_END so trainings can never
# starve the planning acceptance or the bench: trainings share the window
# up to HARD_END-7200, plans split the window up to HARD_END-1800, bench
# gets the rest. Trainings resume from the latest checkpoint, so a timeout
# kill only loses the in-flight epoch.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/final_phase.log
HARD_END=${HARD_END:-1787054100}  # 11:55 UTC
echo "[final] start $(date); hard end $(date -d @$HARD_END)" >> $LOG

# stale preprocess caches reflect the pre-campaign episode sets
rm -rf data/preprocess/rope data/preprocess/granular data/preprocess/cloth

# measure the GNN aggregation mode on the chip (matmul vs slotted train
# chunks are mathematically identical; the winner carries through training,
# rollout eval and planning via ADAPTIGRAPH_GNN_AGG)
echo "[final] aggregation probe $(date)" >> $LOG
timeout 1500 python scripts/probe_train_agg.py > /tmp/probe_agg.log 2>&1
AGG=$(grep -o 'AGG_WINNER=[a-z]*' /tmp/probe_agg.log | tail -1 | cut -d= -f2)
export ADAPTIGRAPH_GNN_AGG=${AGG:-matmul}
echo "[final] aggregation mode: $ADAPTIGRAPH_GNN_AGG $(date)" >> $LOG

# frame-cost decomposition at the bench point (profiling data for the PBD
# lever; bounded — purely informational)
echo "[final] frame-part profile $(date)" >> $LOG
timeout 900 python scripts/bench_frame_parts.py > /tmp/frame_parts_r3.log 2>&1
echo "[final] frame-part profile rc=$? $(date)" >> $LOG
cp /tmp/frame_parts_r3.log data/frame_parts_r3.log 2>/dev/null

TRAIN_END=$((HARD_END - 7200))
PLAN_END=$((HARD_END - 2400))

# chunked device-resident training (train.py steps_per_call) makes a
# reference-comparable budget affordable: 40 epochs x 500 iters x batch 128
# = 20k optimizer steps per material
mats=(rope granular cloth)
for mi in "${!mats[@]}"; do
  MAT=${mats[$mi]}
  left=$(( ${#mats[@]} - mi ))
  for attempt in 1 2; do
    NOW=$(date +%s)
    budget=$(( (TRAIN_END - NOW) / left ))
    [ "$budget" -gt 5400 ] && budget=5400
    if [ "$budget" -lt 900 ]; then
      echo "[final] train $MAT skipped (out of budget) $(date)" >> $LOG
      break
    fi
    echo "[final] train $MAT attempt $attempt budget ${budget}s $(date)" >> $LOG
    timeout "$budget" python scripts/train_material.py "$MAT" \
      "${EPOCHS:-40}" "${ITERS:-500}" "${BATCH:-128}" \
      >> "/tmp/final_train_${MAT}.log" 2>&1
    rc=$?
    echo "[final] train $MAT attempt $attempt rc=$rc $(date)" >> $LOG
    # rc 0 = trained + rolled out; retries resume from the latest
    # checkpoint (train resume=True), so a timeout kill only loses the
    # in-flight epoch
    [ "$rc" -eq 0 ] && break
    bash scripts/tpu_watch.sh >> $LOG 2>&1
  done
done

for MAT in rope granular; do
  NOW=$(date +%s)
  budget=$(( (PLAN_END - NOW) / 2 ))
  [ "$MAT" = granular ] && budget=$((PLAN_END - NOW))
  [ "$budget" -gt 3600 ] && budget=3600
  if [ "$budget" -lt 600 ]; then
    echo "[final] plan $MAT skipped (out of budget) $(date)" >> $LOG
    continue
  fi
  echo "[final] plan $MAT budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/plan_acceptance.py "$MAT" 10 20000 \
    >> "/tmp/final_plan_${MAT}.log" 2>&1
  echo "[final] plan $MAT rc=$? $(date)" >> $LOG
done

echo "[final] bench $(date)" >> $LOG
timeout 2300 python bench.py >> /tmp/final_bench.log 2>&1
echo "[final] bench rc=$? $(date)" >> $LOG
echo "[final] DONE $(date)" >> $LOG
