#!/bin/bash
# Round-4 final phase: train all three materials on the campaign data
# (20k optimizer steps each), rollout-eval at the reference's 100-step
# horizon, run full-scale planning acceptance (rope + granular), then the
# headline bench. Every evaluation artifact is COPIED INTO GIT (data/eval,
# data/plan_*) as soon as it exists — campaign data has been lost to VM
# resets twice (VERDICT r3 weak #6); durable-or-it-didn't-happen.
#
# Stages are budgeted backward from HARD_END: trainings share the window up
# to HARD_END-6600, plans split up to HARD_END-2400, bench gets the rest.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/final_phase_r4.log
HARD_END=${HARD_END:?set HARD_END epoch secs}
echo "[final4] start $(date); hard end $(date -d @$HARD_END)" >> $LOG

commit_evals() {
  for MAT in rope granular cloth; do
    mkdir -p data/eval/$MAT
    cp -f data/rollout/$MAT/error_median.txt data/eval/$MAT/ 2>/dev/null
    cp -f data/rollout/$MAT/error_short.txt data/eval/$MAT/ 2>/dev/null
    cp -f data/rollout/$MAT/error_short.png data/eval/$MAT/ 2>/dev/null
    cp -f data/log/$MAT/loss_train.txt data/eval/$MAT/ 2>/dev/null
    cp -f data/log/$MAT/loss_valid.txt data/eval/$MAT/ 2>/dev/null
    cp -f data/log/$MAT/loss.png data/eval/$MAT/ 2>/dev/null
  done
  git add -A data/eval data/plan_rope data/plan_granular 2>/dev/null
  git diff --cached --quiet -- data/eval data/plan_rope data/plan_granular \
    || git commit -q -m "eval: round-4 training/rollout/planning artifacts" \
         --only -- data/eval data/plan_rope data/plan_granular
}

# stale preprocess caches reflect the pre-campaign episode sets
rm -rf data/preprocess/rope data/preprocess/granular data/preprocess/cloth

echo "[final4] aggregation probe $(date)" >> $LOG
timeout 1500 python scripts/probe_train_agg.py > /tmp/probe_agg.log 2>&1
AGG=$(grep -o 'AGG_WINNER=[a-z]*' /tmp/probe_agg.log | tail -1 | cut -d= -f2)
export ADAPTIGRAPH_GNN_AGG=${AGG:-matmul}
echo "[final4] aggregation mode: $ADAPTIGRAPH_GNN_AGG $(date)" >> $LOG

TRAIN_END=$((HARD_END - 6600))
PLAN_END=$((HARD_END - 2400))

mats=(rope granular cloth)
for mi in "${!mats[@]}"; do
  MAT=${mats[$mi]}
  left=$(( ${#mats[@]} - mi ))
  for attempt in 1 2; do
    NOW=$(date +%s)
    budget=$(( (TRAIN_END - NOW) / left ))
    [ "$budget" -gt 5400 ] && budget=5400
    if [ "$budget" -lt 900 ]; then
      echo "[final4] train $MAT skipped (out of budget) $(date)" >> $LOG
      break
    fi
    echo "[final4] train $MAT attempt $attempt budget ${budget}s $(date)" >> $LOG
    # training may use ~60% of the slot; the rest is the rollout's (a
    # training that eats the whole timeout leaves no evaluation artifact)
    ADAPTIGRAPH_TRAIN_WALL=$((budget * 60 / 100)) \
      timeout "$budget" python scripts/train_material.py "$MAT" \
      "${EPOCHS:-40}" "${ITERS:-500}" "${BATCH:-128}" \
      >> "/tmp/final_train_${MAT}.log" 2>&1
    rc=$?
    echo "[final4] train $MAT attempt $attempt rc=$rc $(date)" >> $LOG
    commit_evals
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
    echo "[final4] plan $MAT skipped (out of budget) $(date)" >> $LOG
    continue
  fi
  echo "[final4] plan $MAT budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/plan_acceptance.py "$MAT" 10 20000 \
    >> "/tmp/final_plan_${MAT}.log" 2>&1
  rc=$?
  echo "[final4] plan $MAT rc=$rc $(date)" >> $LOG
  # a timeout-killed run still yields a complete artifact post-hoc
  [ "$rc" -ne 0 ] && python scripts/plan_accept_eval.py "$MAT" \
    >> "/tmp/final_plan_${MAT}.log" 2>&1
  commit_evals
done

echo "[final4] bench $(date)" >> $LOG
timeout 3000 python bench.py > /tmp/final_bench_r4.json 2>/tmp/final_bench_r4.log
echo "[final4] bench rc=$? $(date)" >> $LOG
commit_evals
echo "[final4] DONE $(date)" >> $LOG
