#!/bin/bash
# Session-7 pipeline: widen the cloth data window (cloth has 1 usable
# episode after the r2 set was regenerated away; granular/rope are at
# 16/20+), then the round-3 final phase (trainings -> plans -> bench).
# Replaces run_session5c.sh's tail: waits for the in-flight granular
# campaign, runs TWO cloth batches instead of one, hands off to
# final_phase_r3.sh whose stages are budgeted backward from HARD_END.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/session7.log
WAIT_PID=${WAIT_PID:-}
HARD_END=${HARD_END:-1787054100}  # 11:55 UTC

if [ -n "$WAIT_PID" ]; then
  echo "[s7] waiting for in-flight granular campaign pid $WAIT_PID $(date)" >> $LOG
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[s7] granular campaign done $(date)" >> $LOG
fi

bash scripts/tpu_watch.sh >> $LOG 2>&1

echo "[s7] cloth campaign (8 episodes, base 500) $(date)" >> $LOG
CLOTH_BASE=500 CLOTH_N=8 bash scripts/run_cloth_campaign.sh
echo "[s7] cloth done $(date)" >> $LOG

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[s7] final phase $(date)" >> $LOG
HARD_END=$HARD_END bash scripts/final_phase_r3.sh
echo "[s7] ALL DONE $(date)" >> $LOG
