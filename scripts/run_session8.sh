#!/bin/bash
# Session-8 pipeline (fresh VM: the session-5/6/7 campaign data did not
# survive the restart — only rope 000000-3 w/ 3 pushes, granular 000002 and
# cloth 000000 partials remain). Rebuild the dataset, then the round-3
# final phase. Same structure as run_session5b.sh with fresh deadlines:
#   rope (batch-8, timeout-bounded)   -> GRAN_START
#   granular (sequential, watchdog)   -> CLOTH_START
#   cloth (batch-4, watchdog)         -> FINAL_START
#   final_phase_r3.sh                 -> HARD_END
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session8.log
GRAN_START=${GRAN_START:-1787054400}   # 12:00 UTC
CLOTH_START=${CLOTH_START:-1787063400} # 14:30 UTC
FINAL_START=${FINAL_START:-1787069400} # 16:10 UTC
HARD_END=${HARD_END:-1787085600}       # 20:40 UTC

echo "[s8] start $(date)" >> $LOG
bash scripts/tpu_watch.sh >> $LOG 2>&1

# rope: finish the surviving 720^2 episodes' push budget via resume, then
# fresh 360^2 bases until the granular deadline
for base in 0 8 16 24 32 40; do
  [ "$(date +%s)" -ge "$GRAN_START" ] && break
  done_n=0
  for i in $(seq 0 7); do
    d=$(printf 'data/sim_data/rope/%06d' $((base + i)))
    [ "$(ls "$d" 2>/dev/null | grep -c '\.h5$')" -ge 6 ] && done_n=$((done_n + 1))
  done
  if [ "$done_n" -eq 8 ]; then
    echo "[s8] rope base $base already complete $(date)" >> $LOG
    continue
  fi
  echo "[s8] rope batch base $base start (resume-aware) $(date)" >> $LOG
  timeout 4500 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/rope --n-episode 8 --batch 8 \
    --base "$base" --out data/sim_data >> /tmp/rope_batch.log 2>&1
  echo "[s8] rope batch base $base rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[s8] granular campaign until $(date -d @$CLOTH_START)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-300} GRAN_N=${GRAN_N:-24} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[s8] granular done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s8] cloth campaign, $n episodes $(date)" >> $LOG
  GRAN_RETRY=0 CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n \
    bash scripts/run_cloth_campaign.sh
  echo "[s8] cloth done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s8] final phase $(date)" >> $LOG
HARD_END=$HARD_END bash scripts/final_phase_r3.sh
echo "[s8] ALL DONE $(date)" >> $LOG
