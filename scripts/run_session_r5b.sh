#!/bin/bash
# Round-5 pipeline, phase 2 — replaces run_session_r5.sh from the cloth
# phase on (the parent was retired once the rope-acceptance root cause was
# found: the rope's pinned tail, by_softrope.h:219-221 parity, makes rigid
# translation targets unreachable; plan_acceptance.py now records an
# ACHIEVED perceived state as the target). The granular campaign child from
# r5a keeps running to its own 23:05 deadline; this script waits on it.
#   wait granular campaign (WAIT_PID)                 -> ~23:05
#   rope acceptance RE-RUN (recorded-target scheme)   (skip if past 23:45)
#   cloth campaign (resume 504, new 508/512)          -> CLOTH_END 01:00
#   retrain granular + cloth                          -> TRAIN_END 02:10
#   rope 100-step pair-walk rollout re-eval           -> ROPE_RO_END 02:35
#   cloth acceptance (recorded-target scheme)         -> HARD_END 03:10
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5.log
ROPE_ACC_LATEST=${ROPE_ACC_LATEST:-1787189400} # 01:30 UTC (late-recovery contingency: rope acceptance outranks cloth episodes)
CLOTH_END=${CLOTH_END:-1787187600}             # 01:00 UTC
TRAIN_END=${TRAIN_END:-1787191800}             # 02:10 UTC
ROPE_RO_END=${ROPE_RO_END:-1787193300}         # 02:35 UTC
HARD_END=${HARD_END:-1787195400}               # 03:10 UTC

echo "[r5b] start $(date)" >> $LOG

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
  git add -A data/eval data/plan_rope data/plan_granular data/plan_cloth 2>/dev/null
  git diff --cached --quiet -- data/eval data/plan_rope data/plan_granular data/plan_cloth \
    || git commit -q -m "eval: round-5 training/rollout/planning artifacts" \
         --only -- data/eval data/plan_rope data/plan_granular data/plan_cloth
}

ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0; }
run_watched() {
  local stall_min=$1; shift
  "$@" &
  local pid=$! last=0 still=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now; now=$(ticks "$pid")
    if [ "$now" -le "$((last + 30))" ]; then still=$((still + 1)); else still=0; fi
    last=$now
    if [ "$still" -ge "$stall_min" ]; then
      echo "[r5b watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

# ---- wait out the r5a granular campaign ----
if [ -n "${WAIT_PID:-}" ]; then
  echo "[r5b] waiting granular campaign pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[r5b] granular campaign done $(date)" >> $LOG
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope acceptance re-run (recorded target; VERDICT r4 #3) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$ROPE_ACC_LATEST" ]; then
  rm -rf data/plan_rope_r5s1
  mkdir -p data/plan_rope_r5s1
  mv data/plan_rope/* data/plan_rope_r5s1/ 2>/dev/null  # keep the s1 evidence
  git add -A data/plan_rope data/plan_rope_r5s1 2>/dev/null
  git commit -q -m "data: preserve r5-s1 rope acceptance (unreachable-target run)" \
    --only -- data/plan_rope data/plan_rope_r5s1 2>/dev/null
  echo "[r5b] rope acceptance re-run $(date)" >> $LOG
  timeout 2700 python scripts/plan_acceptance.py rope 10 20000 \
    >> /tmp/r5b_plan_rope.log 2>&1
  rc=$?
  echo "[r5b] rope acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
    >> /tmp/r5b_plan_rope.log 2>&1
  commit_evals
else
  echo "[r5b] rope acceptance skipped (past latest-start) $(date)" >> $LOG
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth campaign ----
for base in 504 508 512 516 520; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$CLOTH_END" ] && break
  left=$((CLOTH_END - NOW)); [ "$left" -gt 2700 ] && left=2700
  [ "$left" -lt 900 ] && break
  echo "[r5b] cloth batch base $base (${left}s) $(date)" >> $LOG
  run_watched 28 timeout "$left" python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/cloth --n-episode 4 --batch 4 \
    --base "$base" --out data/sim_data >> /tmp/cloth_batch.log 2>&1
  echo "[r5b] cloth base $base rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- retrain granular + cloth ----
rm -rf data/preprocess/granular data/preprocess/cloth
for MAT in granular cloth; do
  NOW=$(date +%s)
  budget=$((TRAIN_END - NOW)); [ "$MAT" = granular ] && budget=$((budget / 2))
  [ "$budget" -gt 4200 ] && budget=4200
  if [ "$budget" -lt 900 ]; then
    echo "[r5b] train $MAT skipped (budget) $(date)" >> $LOG; continue
  fi
  echo "[r5b] train $MAT budget ${budget}s $(date)" >> $LOG
  ADAPTIGRAPH_TRAIN_WALL=$((budget * 60 / 100)) \
    timeout "$budget" python scripts/train_material.py "$MAT" \
    "${EPOCHS:-40}" "${ITERS:-500}" "${BATCH:-128}" \
    >> "/tmp/r5_train_${MAT}.log" 2>&1
  echo "[r5b] train $MAT rc=$? $(date)" >> $LOG
  commit_evals
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- rope long-horizon rollout re-eval (VERDICT r4 #7) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$ROPE_RO_END" ]; then
  budget=$((ROPE_RO_END - NOW)); [ "$budget" -gt 1800 ] && budget=1800
  echo "[r5b] rope rollout re-eval budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/rollout_material.py rope best 100 \
    >> /tmp/r5_rollout_rope.log 2>&1
  echo "[r5b] rope rollout rc=$? $(date)" >> $LOG
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth acceptance (first ever), granular re-run only with leftovers ----
for MAT in cloth granular; do
  NOW=$(date +%s)
  budget=$((HARD_END - NOW - 120))
  [ "$budget" -gt 2700 ] && budget=2700
  if [ "$budget" -lt 600 ]; then
    echo "[r5b] plan $MAT skipped (budget) $(date)" >> $LOG; continue
  fi
  echo "[r5b] plan $MAT budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/plan_acceptance.py "$MAT" 10 20000 \
    >> "/tmp/r5_plan_${MAT}.log" 2>&1
  rc=$?
  echo "[r5b] plan $MAT rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py "$MAT" \
    >> "/tmp/r5_plan_${MAT}.log" 2>&1
  commit_evals
done

commit_evals
echo "[r5b] ALL DONE $(date)" >> $LOG
