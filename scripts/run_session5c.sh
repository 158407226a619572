#!/bin/bash
# Session-5 pipeline, take 3: granular-first. Rope has ~30 episodes banked;
# granular has none — hand it the TPU as early as possible. Waits for any
# in-flight batch (WAIT_PID), optionally finishes one rope top-up batch,
# then granular until CLOTH_START, cloth until FINAL_START, final phase.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session5.log
CLOTH_START=${CLOTH_START:-1787030431} # 05:20:31 UTC
FINAL_START=${FINAL_START:-1787035231} # 06:40:31 UTC

if [ -n "${WAIT_PID:-}" ]; then
  echo "[s5c] waiting for in-flight pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[s5c] in-flight done $(date)" >> $LOG
fi

if [ "${ROPE_TOPUP_BASE:-0}" -gt 0 ]; then
  echo "[s5c] rope top-up base $ROPE_TOPUP_BASE $(date)" >> $LOG
  timeout 4500 python -m adaptigraph_tpu.sim.batch_env \
    --config data_gen/rope --n-episode 8 --batch 8 \
    --base "$ROPE_TOPUP_BASE" --out data/sim_data >> /tmp/rope_batch.log 2>&1
  echo "[s5c] rope top-up rc=$? $(date)" >> $LOG
  bash scripts/tpu_watch.sh >> $LOG 2>&1
fi

echo "[s5c] granular campaign until $(date -d @$CLOTH_START) $(date)" >> $LOG
GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-331} GRAN_N=${GRAN_N:-24} \
  GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
echo "[s5c] granular done $(date)" >> $LOG

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[s5c] cloth campaign, $n episodes $(date)" >> $LOG
  CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n bash scripts/run_cloth_campaign.sh
  echo "[s5c] cloth done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s5c] final phase $(date)" >> $LOG
bash scripts/final_phase_r3.sh
echo "[s5c] ALL DONE $(date)" >> $LOG
