#!/bin/bash
# Round-3 final phase: retrain all three materials on the refreshed
# campaign data, rollout-eval each, run the full-scale planning acceptance
# (rope + granular), then the headline bench. Run AFTER killing any
# campaign process (only one process can hold the TPU).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/final_phase.log
echo "[final] start $(date)" >> $LOG

# stale preprocess caches reflect the pre-campaign episode sets
rm -rf data/preprocess/rope data/preprocess/granular data/preprocess/cloth

# chunked device-resident training (train.py steps_per_call) makes a
# reference-comparable budget affordable: 40 epochs x 500 iters x batch 128
# = 20k optimizer steps per material
for MAT in rope granular cloth; do
  for attempt in 1 2; do
    echo "[final] train $MAT attempt $attempt $(date)" >> $LOG
    timeout 5400 python scripts/train_material.py "$MAT" \
      "${EPOCHS:-40}" "${ITERS:-500}" "${BATCH:-128}" \
      >> "/tmp/final_train_${MAT}.log" 2>&1
    rc=$?
    echo "[final] train $MAT attempt $attempt rc=$rc $(date)" >> $LOG
    # rc 0 = trained + rolled out; retries resume from the latest
    # checkpoint (train resume=True), so a watchdog/timeout kill only
    # loses the in-flight epoch
    [ "$rc" -eq 0 ] && break
    bash scripts/tpu_watch.sh >> $LOG 2>&1
  done
done

echo "[final] plan rope $(date)" >> $LOG
timeout 3600 python scripts/plan_acceptance.py rope 10 20000 \
  >> /tmp/final_plan_rope.log 2>&1
echo "[final] plan rope rc=$? $(date)" >> $LOG

echo "[final] plan granular $(date)" >> $LOG
timeout 3600 python scripts/plan_acceptance.py granular 10 20000 \
  >> /tmp/final_plan_granular.log 2>&1
echo "[final] plan granular rc=$? $(date)" >> $LOG

echo "[final] bench $(date)" >> $LOG
timeout 1800 python bench.py >> /tmp/final_bench.log 2>&1
echo "[final] bench rc=$? $(date)" >> $LOG
echo "[final] DONE $(date)" >> $LOG
