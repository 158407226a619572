#!/bin/bash
# Round-5 interlude (driving session, Aug 20 ~00:50 UTC): the r5b rope
# acceptance re-run hung at env build for its whole 45-min budget (wedged
# worker after the granular campaign) and rc=124'd. r5b is SIGSTOPped in
# its post-failure tpu_watch; this script waits for the worker to recover,
# runs the rope acceptance itself (recorded-target scheme, default seed),
# commits the artifacts, waits out any wedge it caused, then SIGCONTs r5b
# so the rest of the pipeline (trains -> rollouts -> cloth acceptance)
# proceeds untouched.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ADAPTIGRAPH_GNN_AGG=slotmm
LOG=/tmp/r5_interlude.log
R5B_PID=${R5B_PID:-1578}
WATCH_PID=${WATCH_PID:-13697}

echo "[interlude] waiting for tpu_watch $WATCH_PID to exit $(date)" >> $LOG
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 20; done
echo "[interlude] TPU recovered; starting rope acceptance $(date)" >> $LOG

ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0; }
timeout 2700 python scripts/plan_acceptance.py rope 10 20000 \
  > /tmp/interlude_plan_rope.log 2>&1 &
pid=$!
last=0; still=0; rc=0
while kill -0 "$pid" 2>/dev/null; do
  sleep 60
  now=$(ticks "$pid")
  if [ "$now" -le "$((last + 30))" ]; then still=$((still + 1)); else still=0; fi
  last=$now
  # env build takes ~6 min of mostly-idle host time on a healthy worker;
  # 14 idle minutes means the wedge is back — don't burn the full 45.
  if [ "$still" -ge 14 ]; then
    echo "[interlude] acceptance stalled 14m; killing $(date)" >> $LOG
    kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
    rc=9
    break
  fi
done
wait "$pid" 2>/dev/null; wrc=$?
[ "$rc" -eq 0 ] && rc=$wrc
echo "[interlude] rope acceptance rc=$rc $(date)" >> $LOG

if [ "$rc" -ne 0 ]; then
  nice -n 19 python scripts/plan_accept_eval.py rope \
    >> /tmp/interlude_plan_rope.log 2>&1
fi
git add -A data/plan_rope 2>/dev/null
git diff --cached --quiet -- data/plan_rope \
  || git commit -q -m "data: rope closed-loop acceptance (recorded-target scheme)" \
       --only -- data/plan_rope

# hand the TPU back healthy (a mid-run kill wedges the worker ~30-45 min)
bash scripts/tpu_watch.sh >> $LOG 2>&1
kill -CONT "$R5B_PID" 2>/dev/null
echo "[interlude] r5b resumed $(date)" >> $LOG
