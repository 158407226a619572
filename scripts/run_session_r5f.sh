#!/bin/bash
# Round-5 pipeline, phase 6 (r5f) — supersedes r5e after discovering the
# VM reset also wiped data/preprocess, data/sim_data originals, and every
# checkpoint payload that wasn't git-tracked (rope's tracked `latest` kept
# only metadata; granular had nothing). Recovery done before launch:
#   * restore_compact.sh: 815 episode files back under data/sim_data
#   * rope/cloth preprocess regenerated (CPU, 50 s)
#   * rope checkpoint payload restored from commit a23cbce (loads OK,
#     252,903 params) + train_state.json seeded epoch=0 for warm resume
#   * data/log_cloth/cloth (payload intact in git) copied to data/log/cloth
# Sequence, highest-value-first per VERDICT r4:
#   rope resume-train (wall 1680 s) + 100-step rollout   VERDICT #7
#   rope acceptance (recorded-target, seed 59)           VERDICT #3
#   cloth acceptance (first ever, seed 11)               VERDICT #5
#   granular fill with leftover budget                   VERDICT #4
#   TPU freed by HARD_END 07:50 for the driver's bench capture.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5e.log
ROPE_PLAN_END=${ROPE_PLAN_END:-1787207700}   # 06:35 UTC Aug 20
CLOTH_PLAN_END=${CLOTH_PLAN_END:-1787210700} # 07:25
GRAN_END=${GRAN_END:-1787211900}             # 07:45
HARD_END=${HARD_END:-1787212200}             # 07:50

echo "[r5f] start $(date)" >> $LOG

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
    || git commit -q -m "eval: r5f artifacts (retrain / acceptance / rollouts)" \
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
      echo "[r5f watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope resume-train + builtin 100-step best rollout ----
echo "[r5f] rope retrain $(date)" >> $LOG
ADAPTIGRAPH_TRAIN_WALL=1680 run_watched 20 timeout 3600 \
  python scripts/train_material.py rope 60 500 128 \
  >> /tmp/r5f_train_rope.log 2>&1
echo "[r5f] rope retrain rc=$? $(date)" >> $LOG
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope acceptance (recorded-target scheme; VERDICT r4 #3) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((ROPE_PLAN_END - 900))" ]; then
  left=$((ROPE_PLAN_END - NOW)); [ "$left" -gt 3300 ] && left=3300
  echo "[r5f] rope acceptance (${left}s) $(date)" >> $LOG
  run_watched 14 timeout "$left" python scripts/plan_acceptance.py rope 10 20000 \
    >> /tmp/r5f_plan_rope.log 2>&1
  rc=$?
  echo "[r5f] rope acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
    >> /tmp/r5f_plan_rope.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth acceptance (first ever; VERDICT r4 #5) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((CLOTH_PLAN_END - 900))" ]; then
  left=$((CLOTH_PLAN_END - NOW)); [ "$left" -gt 2700 ] && left=2700
  echo "[r5f] cloth acceptance (${left}s) $(date)" >> $LOG
  run_watched 14 timeout "$left" python scripts/plan_acceptance.py cloth 10 20000 \
    >> /tmp/r5f_plan_cloth.log 2>&1
  rc=$?
  echo "[r5f] cloth acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py cloth \
    >> /tmp/r5f_plan_cloth.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- granular fill (sequential, known-good) with leftover budget ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((GRAN_END - 900))" ]; then
  echo "[r5f] granular campaign until $GRAN_END $(date)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=405 GRAN_N=40 GRAN_DEADLINE=$GRAN_END \
    STALL_MIN_SEQ=25 bash scripts/run_granular_campaign.sh
  echo "[r5f] granular campaign done $(date)" >> $LOG
fi

nice -n 19 python scripts/compact_episodes.py --commit >> /tmp/durable_commit.log 2>&1
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[r5f] ALL DONE $(date)" >> $LOG
