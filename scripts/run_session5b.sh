#!/bin/bash
# Session-5 pipeline, take 2. The tick-based stall watchdog killed a HEALTHY
# rope batch-8 at minute 25: a rope push round is ~15 min of host-idle
# remote-TPU work, so consecutive rounds look exactly like a hang to the
# sampler. Rope batches here are bounded by timeout(1) alone (rope batch
# hangs have never been observed; granular/cloth keep their tuned watchdogs
# inside their campaign scripts).
#
# Waits for the orphaned in-flight batch (WAIT_PID) before touching the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session5.log
GRAN_START=${GRAN_START:-1787021431}   # 02:50:31 UTC
CLOTH_START=${CLOTH_START:-1787030431} # 05:20:31 UTC
FINAL_START=${FINAL_START:-1787035231} # 06:40:31 UTC

if [ -n "${WAIT_PID:-}" ]; then
  echo "[s5b] waiting for in-flight batch pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[s5b] in-flight batch done $(date)" >> $LOG
fi

# rope: base 8 first (resume episodes 8-15 where the mis-kill stopped them),
# then fresh bases until the granular deadline
for base in 8 16 24 32 40 48 56 64 72 80 88; do
  [ "$(date +%s)" -ge "$GRAN_START" ] && break
  # skip bases whose 8 episodes already have all 6 h5 files
  done_n=0
  for i in $(seq 0 7); do
    d=$(printf 'data/sim_data/rope/%06d' $((base + i)))
    [ "$(ls "$d" 2>/dev/null | grep -c '\.h5$')" -ge 6 ] && done_n=$((done_n + 1))
  done
  if [ "$done_n" -eq 8 ]; then
    echo "[s5b] rope base $base already complete $(date)" >> $LOG
    continue
  fi
  echo "[s5b] rope batch base $base start (resume-aware) $(date)" >> $LOG
  timeout 4500 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/rope --n-episode 8 --batch 8 \
    --base "$base" --out data/sim_data >> /tmp/rope_batch.log 2>&1
  echo "[s5b] rope batch base $base rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
done

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[s5b] granular campaign until $(date -d @$CLOTH_START)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-331} GRAN_N=${GRAN_N:-16} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[s5b] granular done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s5b] cloth campaign, $n episodes $(date)" >> $LOG
  CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n bash scripts/run_cloth_campaign.sh
  echo "[s5b] cloth done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s5b] final phase $(date)" >> $LOG
bash scripts/final_phase_r3.sh
echo "[s5b] ALL DONE $(date)" >> $LOG
