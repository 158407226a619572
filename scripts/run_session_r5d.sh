#!/bin/bash
# Round-5 pipeline, phase 4 — written by the Aug-20 driving session after
# the 00:12 worker wedge killed r5b's rope acceptance and the interlude
# died with its session. Supersedes r5b (SIGSTOPped latch) and r5c (its
# deadlines assumed r5b ended 03:10); both are killed by the launcher.
# Fresh sequencing, highest-value-first once the worker recovers:
#   tpu_watch (wait out the wedge)
#   rope acceptance (recorded-target scheme)     ASAP, <=55 min
#   rope 100-step pair-walk rollout re-eval      <=30 min (VERDICT #7)
#   granular sequential campaign                 -> GRAN_END  06:15
#   cloth batch-4 campaign (bases 508+)          -> CLOTH_END 09:15
#   retrain granular + cloth                     -> TRAIN_END 10:50
#   rollout re-evals (only if train rc != 0)     -> RO_END    11:20
#   acceptance picks (cloth first; rope seed 113 fallback) -> PLAN_END 12:20
#   bench compile-cache warm (optional)          -> HARD_END  12:30
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5.log
GRAN_END=${GRAN_END:-1787206500}    # 06:15 UTC Aug 20
CLOTH_END=${CLOTH_END:-1787217300}  # 09:15
TRAIN_END=${TRAIN_END:-1787223000}  # 10:50
RO_END=${RO_END:-1787224800}        # 11:20
PLAN_END=${PLAN_END:-1787228400}    # 12:20
HARD_END=${HARD_END:-1787229000}    # 12:30

echo "[r5d] start $(date)" >> $LOG

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
    || git commit -q -m "eval: round-5 final-session artifacts (acceptance / rollouts / retrains)" \
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
      echo "[r5d watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope acceptance (recorded-target scheme; VERDICT r4 #3) ----
echo "[r5d] rope acceptance $(date)" >> $LOG
run_watched 14 timeout 3300 python scripts/plan_acceptance.py rope 10 20000 \
  >> /tmp/r5d_plan_rope.log 2>&1
rc=$?
echo "[r5d] rope acceptance rc=$rc $(date)" >> $LOG
[ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py rope \
  >> /tmp/r5d_plan_rope.log 2>&1
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- rope 100-step pair-walk rollout re-eval (VERDICT r4 #7) ----
echo "[r5d] rope rollout re-eval $(date)" >> $LOG
run_watched 20 timeout 2100 python scripts/rollout_material.py rope best 100 \
  >> /tmp/r5d_rollout_rope.log 2>&1
echo "[r5d] rope rollout rc=$? $(date)" >> $LOG
commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- granular sequential campaign ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((GRAN_END - 900))" ]; then
  echo "[r5d] granular campaign until $GRAN_END $(date)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=405 GRAN_N=40 GRAN_DEADLINE=$GRAN_END \
    STALL_MIN_SEQ=25 bash scripts/run_granular_campaign.sh
  echo "[r5d] granular campaign done $(date)" >> $LOG
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- cloth batch-4 campaign ----
for base in 508 512 516 520 524 528 532 536; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$CLOTH_END" ] && break
  left=$((CLOTH_END - NOW)); [ "$left" -gt 2700 ] && left=2700
  [ "$left" -lt 900 ] && break
  echo "[r5d] cloth batch base $base (${left}s) $(date)" >> $LOG
  run_watched 28 timeout "$left" python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/cloth --n-episode 4 --batch 4 \
    --base "$base" --out data/sim_data >> /tmp/cloth_batch.log 2>&1
  echo "[r5d] cloth base $base rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- retrain granular + cloth on the enlarged datasets ----
rm -rf data/preprocess/granular data/preprocess/cloth
declare -A TRAIN_RC
for MAT in granular cloth; do
  NOW=$(date +%s)
  budget=$((TRAIN_END - NOW)); [ "$MAT" = granular ] && budget=$((budget / 2))
  [ "$budget" -gt 3600 ] && budget=3600
  if [ "$budget" -lt 900 ]; then
    echo "[r5d] train $MAT skipped (budget) $(date)" >> $LOG
    TRAIN_RC[$MAT]=99; continue
  fi
  echo "[r5d] train $MAT budget ${budget}s $(date)" >> $LOG
  ADAPTIGRAPH_TRAIN_WALL=$((budget * 60 / 100)) \
    run_watched 20 timeout "$budget" python scripts/train_material.py "$MAT" \
    "${EPOCHS:-60}" "${ITERS:-500}" "${BATCH:-128}" \
    >> "/tmp/r5d_train_${MAT}.log" 2>&1
  TRAIN_RC[$MAT]=$?
  echo "[r5d] train $MAT rc=${TRAIN_RC[$MAT]} $(date)" >> $LOG
  commit_evals
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- rollout re-evals, only where the train's own rollout was cut ----
for MAT in granular cloth; do
  [ "${TRAIN_RC[$MAT]:-1}" -eq 0 ] && continue
  NOW=$(date +%s)
  [ "$NOW" -ge "$RO_END" ] && break
  budget=$((RO_END - NOW)); [ "$budget" -gt 1500 ] && budget=1500
  [ "$budget" -lt 420 ] && break
  echo "[r5d] rollout $MAT budget ${budget}s $(date)" >> $LOG
  run_watched 20 timeout "$budget" python scripts/rollout_material.py "$MAT" best 100 \
    >> "/tmp/r5d_rollout_${MAT}.log" 2>&1
  echo "[r5d] rollout $MAT rc=$? $(date)" >> $LOG
  commit_evals
done
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- acceptance picks: weakest artifacts first (cloth has none yet) ----
pick_plans() {
  python - <<'EOF'
import json
picks = []
def bar(p):
    try:
        j = json.load(open(p))
    except Exception:
        return False
    return bool(j.get("error_decreased")) and j.get("ppo_abs_gap", 1.0) <= 0.15
for mat in ("cloth", "rope", "granular"):
    if not bar(f"data/plan_{mat}/acceptance.json"):
        picks.append(mat)
print(" ".join(picks[:2]))
EOF
}
for MAT in $(pick_plans); do
  NOW=$(date +%s)
  budget=$((PLAN_END - NOW))
  [ "$budget" -gt 2700 ] && budget=2700
  if [ "$budget" -lt 900 ]; then
    echo "[r5d] plan $MAT skipped (budget) $(date)" >> $LOG; continue
  fi
  # rope retry on fallback seed 113: out-of-sample, true param 0.0739 in
  # the identifiable low-stiffness branch (see r5c notes)
  SEED_ARG=""
  [ "$MAT" = rope ] && SEED_ARG="113"
  if [ -d "data/plan_${MAT}" ]; then
    rm -rf "data/plan_${MAT}_bak"
    cp -r "data/plan_${MAT}" "data/plan_${MAT}_bak"
  fi
  echo "[r5d] plan $MAT budget ${budget}s seed ${SEED_ARG:-default} $(date)" >> $LOG
  run_watched 14 timeout "$budget" python scripts/plan_acceptance.py "$MAT" 10 20000 $SEED_ARG \
    >> "/tmp/r5d_plan_${MAT}.log" 2>&1
  rc=$?
  echo "[r5d] plan $MAT rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && nice -n 19 python scripts/plan_accept_eval.py "$MAT" \
    >> "/tmp/r5d_plan_${MAT}.log" 2>&1
  commit_evals
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- bench compile-cache warm (only with real headroom) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$((HARD_END - 1500))" ]; then
  budget=$((HARD_END - NOW - 120)); [ "$budget" -gt 1600 ] && budget=1600
  echo "[r5d] bench warm budget ${budget}s $(date)" >> $LOG
  ADAPTIGRAPH_BENCH_DEADLINE=$((budget - 60)) timeout "$budget" \
    python bench.py >> /tmp/r5d_bench_warm.log 2>&1
  echo "[r5d] bench warm rc=$? $(date)" >> $LOG
fi

commit_evals
bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[r5d] ALL DONE $(date)" >> $LOG
