#!/bin/bash
# Round-5 pipeline, phase 7 (r5g) — supersedes r5f after its two failures:
#   * rope acceptance OOMed at COMPILE: the recorded-pcd target makes the
#     reward chamfer an (20000, 200, 400) block (~18 GB). Fixed in
#     planning/costs.py::chunked_cost + plan.py's single jitted evaluator
#     (lax.map over n_sample_chunk sub-batches, population-wide
#     error_weight applied globally; bit-equal to the unchunked path).
#   * the rope retrain was watchdog-killed at exactly the 20-min stall bar
#     during what was almost certainly a COLD remote compile (the VM reset
#     wiped the compile cache; remote compiles show ~0 host CPU ticks).
#     Acceptance phases here run with stall_min 28.
# Sequence, highest-value-first per VERDICT r4:
#   rope acceptance (recorded-target, seed 59)            VERDICT #3
#   cloth acceptance (first ever, seed 11)                VERDICT #5
#   rope 100-step pair-walk rollout re-eval               VERDICT #7
#   granular fill with leftover budget                    VERDICT #4
#   TPU freed by HARD_END 08:30 for a warm bench pass + driver capture.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5g.log
ROPE_PLAN_END=${ROPE_PLAN_END:-1787209200}   # 07:00 UTC Aug 20
CLOTH_PLAN_END=${CLOTH_PLAN_END:-1787212500} # 07:55
ROLLOUT_END=${ROLLOUT_END:-1787214000}       # 08:20
GRAN_END=${GRAN_END:-1787214600}             # 08:30
HARD_END=${HARD_END:-1787214600}             # 08:30

echo "[r5g] start $(date)" >> $LOG

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
    || git commit -q -m "eval: r5g artifacts (acceptance / rollouts)" \
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
      echo "[r5g watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope acceptance (recorded-target + chunked reward; VERDICT r4 #3) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((ROPE_PLAN_END - 900))" ]; then
  left=$((ROPE_PLAN_END - NOW)); [ "$left" -gt 4500 ] && left=4500
  echo "[r5g] rope acceptance (${left}s) $(date)" >> $LOG
  run_watched 28 timeout "$left" python scripts/plan_acceptance.py rope 10 20000 \
    >> /tmp/r5g_plan_rope.log 2>&1
  rc=$?
  echo "[r5g] rope acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
    >> /tmp/r5g_plan_rope.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth acceptance (first ever; VERDICT r4 #5) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((CLOTH_PLAN_END - 900))" ]; then
  left=$((CLOTH_PLAN_END - NOW)); [ "$left" -gt 3600 ] && left=3600
  echo "[r5g] cloth acceptance (${left}s) $(date)" >> $LOG
  run_watched 28 timeout "$left" python scripts/plan_acceptance.py cloth 10 20000 \
    >> /tmp/r5g_plan_cloth.log 2>&1
  rc=$?
  echo "[r5g] cloth acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py cloth \
    >> /tmp/r5g_plan_cloth.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope 100-step pair-walk rollout re-eval (VERDICT r4 #7) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((ROLLOUT_END - 600))" ]; then
  left=$((ROLLOUT_END - NOW)); [ "$left" -gt 2400 ] && left=2400
  echo "[r5g] rope rollout re-eval (${left}s) $(date)" >> $LOG
  run_watched 25 timeout "$left" python scripts/rollout_material.py rope latest 100 \
    >> /tmp/r5g_rollout_rope.log 2>&1
  echo "[r5g] rope rollout rc=$? $(date)" >> $LOG
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- granular fill (sequential, known-good) with leftover budget ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((GRAN_END - 900))" ]; then
  echo "[r5g] granular campaign until $GRAN_END $(date)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=405 GRAN_N=40 GRAN_DEADLINE=$GRAN_END \
    STALL_MIN_SEQ=25 bash scripts/run_granular_campaign.sh
  echo "[r5g] granular campaign done $(date)" >> $LOG
fi

nice -n 19 python scripts/compact_episodes.py --commit >> /tmp/durable_commit.log 2>&1
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[r5g] ALL DONE $(date)" >> $LOG
