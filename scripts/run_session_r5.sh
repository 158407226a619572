#!/bin/bash
# Round-5 master pipeline (VERDICT r4 next-steps #2-#7). Self-driving with
# absolute deadlines so it survives the driving session dying (round-5
# sessions have repeatedly died to API overload):
#   rope plan acceptance (pcd target)        [launched separately; WAIT_PID]
#   granular sequential episodes             -> GRAN_END
#   cloth batch-4 episodes (resume 504+)     -> CLOTH_END
#   retrain granular + cloth (40 ep budget)  -> TRAIN_END
#   rope long-horizon rollout re-eval        -> ROPE_RO_END
#   cloth plan acceptance (+granular if time)-> HARD_END
# The driver's own bench capture follows the round: the TPU MUST be free by
# HARD_END (CLAUDE.md bench budget invariant).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/session_r5.log
GRAN_END=${GRAN_END:-1787180700}     # 2026-08-19 23:05 UTC
CLOTH_END=${CLOTH_END:-1787187000}   # 2026-08-20 00:50 UTC
TRAIN_END=${TRAIN_END:-1787191500}   # 2026-08-20 02:05 UTC
ROPE_RO_END=${ROPE_RO_END:-1787193000} # 02:30 UTC
HARD_END=${HARD_END:-1787195100}     # 03:05 UTC

echo "[r5] start $(date); gran $(date -d @$GRAN_END +%H:%M) cloth $(date -d @$CLOTH_END +%H:%M) train $(date -d @$TRAIN_END +%H:%M) hard $(date -d @$HARD_END +%H:%M)" >> $LOG

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
run_watched() {  # stall watchdog: kill after STALL_MIN min of ~0 CPU ticks
  local stall_min=$1; shift
  "$@" &
  local pid=$! last=0 still=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local now; now=$(ticks "$pid")
    if [ "$now" -le "$((last + 30))" ]; then still=$((still + 1)); else still=0; fi
    last=$now
    if [ "$still" -ge "$stall_min" ]; then
      echo "[r5 watchdog] pid $pid stalled ${stall_min}m; killing $(date)" >> $LOG
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null; return 9
    fi
  done
  wait "$pid"
}

# ---- phase A: wait for the separately-launched rope acceptance ----
if [ -n "${WAIT_PID:-}" ]; then
  echo "[r5] waiting rope acceptance pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[r5] rope acceptance done $(date)" >> $LOG
  # post-hoc artifact assembly if the run was killed mid-way
  [ -f data/plan_rope/acceptance.json ] || \
    python scripts/plan_accept_eval.py rope >> /tmp/r5_plan_rope.log 2>&1
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- phase B: granular sequential until GRAN_END ----
NOW=$(date +%s)
if [ "$NOW" -lt "$GRAN_END" ]; then
  echo "[r5] granular campaign until $(date -d @$GRAN_END) $(date)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-400} GRAN_N=${GRAN_N:-48} \
    GRAN_DEADLINE=$GRAN_END bash scripts/run_granular_campaign.sh
  echo "[r5] granular done $(date)" >> $LOG
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- phase C: cloth batch-4 until CLOTH_END (504 resumes the partials) ----
for base in 504 508 512 516 520 524; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$CLOTH_END" ] && break
  left=$((CLOTH_END - NOW)); [ "$left" -gt 2700 ] && left=2700
  [ "$left" -lt 900 ] && break
  echo "[r5] cloth batch base $base (${left}s) $(date)" >> $LOG
  run_watched 28 timeout "$left" python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/cloth --n-episode 4 --batch 4 \
    --base "$base" --out data/sim_data >> /tmp/cloth_batch.log 2>&1
  echo "[r5] cloth base $base rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- phase D: retrain granular + cloth on the enlarged datasets ----
rm -rf data/preprocess/granular data/preprocess/cloth
for MAT in granular cloth; do
  NOW=$(date +%s)
  budget=$((TRAIN_END - NOW)); [ "$MAT" = granular ] && budget=$((budget / 2))
  [ "$budget" -gt 4200 ] && budget=4200
  if [ "$budget" -lt 900 ]; then
    echo "[r5] train $MAT skipped (budget) $(date)" >> $LOG; continue
  fi
  echo "[r5] train $MAT budget ${budget}s $(date)" >> $LOG
  ADAPTIGRAPH_TRAIN_WALL=$((budget * 60 / 100)) \
    timeout "$budget" python scripts/train_material.py "$MAT" \
    "${EPOCHS:-40}" "${ITERS:-500}" "${BATCH:-128}" \
    >> "/tmp/r5_train_${MAT}.log" 2>&1
  echo "[r5] train $MAT rc=$? $(date)" >> $LOG
  commit_evals
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

# ---- phase E: rope long-horizon rollout re-eval (pair-walk, VERDICT #7) ----
NOW=$(date +%s)
if [ "$NOW" -lt "$ROPE_RO_END" ]; then
  budget=$((ROPE_RO_END - NOW)); [ "$budget" -gt 1800 ] && budget=1800
  echo "[r5] rope rollout re-eval budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/rollout_material.py rope best 100 \
    >> /tmp/r5_rollout_rope.log 2>&1
  echo "[r5] rope rollout rc=$? $(date)" >> $LOG
  commit_evals
fi
bash scripts/tpu_watch.sh >> $LOG 2>&1

# ---- phase F: cloth acceptance (first ever), granular re-run if time ----
for MAT in cloth granular; do
  NOW=$(date +%s)
  budget=$((HARD_END - NOW - 180))
  [ "$budget" -gt 2700 ] && budget=2700
  if [ "$budget" -lt 600 ]; then
    echo "[r5] plan $MAT skipped (budget) $(date)" >> $LOG; continue
  fi
  echo "[r5] plan $MAT budget ${budget}s $(date)" >> $LOG
  timeout "$budget" python scripts/plan_acceptance.py "$MAT" 10 20000 \
    >> "/tmp/r5_plan_${MAT}.log" 2>&1
  rc=$?
  echo "[r5] plan $MAT rc=$rc $(date)" >> $LOG
  [ "$rc" -ne 0 ] && python scripts/plan_accept_eval.py "$MAT" \
    >> "/tmp/r5_plan_${MAT}.log" 2>&1
  commit_evals
done

commit_evals
echo "[r5] ALL DONE $(date)" >> $LOG
