#!/bin/bash
# Round-4 back half: granular sequential campaign -> cloth batch-4 campaign
# -> final phase (trainings, 100-step rollouts, plan acceptance, bench).
# Launched after the perf window; deadlines passed via env.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/round4_rest.log
CLOTH_START=${CLOTH_START:?epoch}
FINAL_START=${FINAL_START:?epoch}
HARD_END=${HARD_END:?epoch}

echo "[r4rest] start $(date)" >> $LOG
bash scripts/tpu_watch.sh >> $LOG 2>&1

NOW=$(date +%s)
if [ "$NOW" -lt "$CLOTH_START" ]; then
  echo "[r4rest] granular campaign until $(date -d @$CLOTH_START)" >> $LOG
  GRAN_SEQ_ONLY=1 GRAN_BASE=${GRAN_BASE:-300} GRAN_N=${GRAN_N:-40} \
    GRAN_DEADLINE=$CLOTH_START bash scripts/run_granular_campaign.sh
  echo "[r4rest] granular done $(date)" >> $LOG
fi

NOW=$(date +%s)
if [ "$NOW" -lt "$FINAL_START" ]; then
  nb=$(( (FINAL_START - NOW) / 2400 )); [ "$nb" -lt 1 ] && nb=1
  n=$((nb * 4)); [ "$n" -gt 16 ] && n=16
  echo "[r4rest] cloth campaign, $n episodes $(date)" >> $LOG
  GRAN_RETRY=0 CLOTH_BASE=${CLOTH_BASE:-500} CLOTH_N=$n \
    bash scripts/run_cloth_campaign.sh
  echo "[r4rest] cloth done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[r4rest] final phase $(date)" >> $LOG
HARD_END=$HARD_END bash scripts/final_phase_r4.sh
echo "[r4rest] ALL DONE $(date)" >> $LOG
