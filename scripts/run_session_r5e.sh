#!/bin/bash
# Round-5 pipeline, phase 5 (r5e) — written by the Aug-20 04:07 session.
# The r5d pipeline died with its VM (fresh boot 03:48; /tmp wiped, no
# campaign processes survived) leaving data/plan_rope/acceptance.json
# EMPTY and cloth acceptance still nonexistent. Fresh deadlines for a
# session ending ~08:07 UTC; TPU freed by 07:50 for the driver's bench
# capture. Highest-value-first per VERDICT r4:
#   tpu_watch
#   rope acceptance (recorded-target scheme, seed 59)   <=55 min   VERDICT #3
#   cloth acceptance (first ever, seed 11)              <=45 min   VERDICT #5
#   rope 100-step pair-walk rollout re-eval             <=35 min   VERDICT #7
#   rope seed-113 retry IF run 1 executed but failed the bar,
#     else granular sequential campaign                 -> GRAN_END VERDICT #4
#   free TPU                                            HARD_END 07:50
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5e.log
CLOTH_PLAN_END=${CLOTH_PLAN_END:-1787206500}  # 06:15 UTC Aug 20
ROLLOUT_END=${ROLLOUT_END:-1787208900}        # 06:55
GRAN_END=${GRAN_END:-1787211600}              # 07:40
HARD_END=${HARD_END:-1787212200}              # 07:50

echo "[r5e] start $(date)" >> $LOG

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
    || git commit -q -m "eval: r5e artifacts (acceptance / rollouts)" \
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
      echo "[r5e watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope acceptance run 1 (recorded-target scheme; VERDICT r4 #3) ----
echo "[r5e] rope acceptance $(date)" >> $LOG
run_watched 14 timeout 3300 python scripts/plan_acceptance.py rope 10 20000 \
  >> /tmp/r5e_plan_rope.log 2>&1
rc=$?
echo "[r5e] rope acceptance rc=$rc $(date)" >> $LOG
[ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
  >> /tmp/r5e_plan_rope.log 2>&1
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth acceptance (first ever; VERDICT r4 #5) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((CLOTH_PLAN_END - 900))" ]; then
  left=$((CLOTH_PLAN_END - NOW)); [ "$left" -gt 2700 ] && left=2700
  echo "[r5e] cloth acceptance (${left}s) $(date)" >> $LOG
  run_watched 14 timeout "$left" python scripts/plan_acceptance.py cloth 10 20000 \
    >> /tmp/r5e_plan_cloth.log 2>&1
  rc=$?
  echo "[r5e] cloth acceptance rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py cloth \
    >> /tmp/r5e_plan_cloth.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope 100-step pair-walk rollout re-eval (VERDICT r4 #7) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((ROLLOUT_END - 600))" ]; then
  left=$((ROLLOUT_END - NOW)); [ "$left" -gt 2100 ] && left=2100
  echo "[r5e] rope rollout re-eval (${left}s) $(date)" >> $LOG
  run_watched 20 timeout "$left" python scripts/rollout_material.py rope best 100 \
    >> /tmp/r5e_rollout_rope.log 2>&1
  echo "[r5e] rope rollout rc=$? $(date)" >> $LOG
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope seed-113 retry only if run 1 executed actions but missed the bar;
#      else granular sequential campaign with the remaining budget ----
ROPE_RETRY=$(python - <<'EOF'
import json
try:
    j = json.load(open("data/plan_rope/acceptance.json"))
except Exception:
    j = {}
executed = j.get("n_actions_executed") or 0
ok = bool(j.get("error_decreased")) and (j.get("ppo_abs_gap") or 1.0) <= 0.15
# retry on the out-of-sample low-branch seed only when the scheme itself
# ran (executed >= 6) but the properties failed — a wedged/empty run means
# the time is better spent on data
print("yes" if (executed >= 6 and not ok) else "no")
EOF
)
NOW=$(date +%s)
if [ "$ROPE_RETRY" = yes ] && [ "$NOW" -lt "$((GRAN_END - 1500))" ]; then
  budget=$((GRAN_END - NOW)); [ "$budget" -gt 3300 ] && budget=3300
  rm -rf data/plan_rope_bak; cp -r data/plan_rope data/plan_rope_bak
  echo "[r5e] rope retry seed 113 (${budget}s) $(date)" >> $LOG
  run_watched 14 timeout "$budget" python scripts/plan_acceptance.py rope 10 20000 113 \
    >> /tmp/r5e_plan_rope113.log 2>&1
  rc=$?
  echo "[r5e] rope retry rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
    >> /tmp/r5e_plan_rope113.log 2>&1
  commit_evals
  bash scripts/tpu_watch.sh >> $LOG 2>&1
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$((GRAN_END - 900))" ]; then
  echo "[r5e] granular campaign until $GRAN_END $(date)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=405 GRAN_N=40 GRAN_DEADLINE=$GRAN_END \
    STALL_MIN_SEQ=25 bash scripts/run_granular_campaign.sh
  echo "[r5e] granular campaign done $(date)" >> $LOG
fi

nice -n 19 python scripts/compact_episodes.py --commit >> /tmp/durable_commit.log 2>&1
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[r5e] ALL DONE $(date)" >> $LOG
