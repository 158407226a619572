#!/bin/bash
# Round-4 perf window (runs once the rope campaign releases the TPU):
#   1. MPPI 20k-sample smoke with the new n_sample_chunk lax.map path —
#      de-risks BENCH_r04's mppi_samples_per_s (VERDICT r3 #1) before the
#      final phase depends on it.
#   2. Single-env frame decomposition at the current operating point
#      (VERDICT r3 #5: where does the 1.2 ms frame go now?).
#   3. Batched 1/2/4/8-env scaling per pass (VERDICT r3 #4: explain the
#      1.36x 4-env aggregate).
# Then chains into run_round4_rest.sh (granular -> cloth -> final phase).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/perf_r4.log
ROPE_PID=${ROPE_PID:?pid of run_rope_r4.sh}

echo "[perf4] waiting for rope campaign (pid $ROPE_PID) $(date)" >> $LOG
while kill -0 "$ROPE_PID" 2>/dev/null; do sleep 30; done
echo "[perf4] rope done; perf window starts $(date)" >> $LOG
bash scripts/tpu_watch.sh >> $LOG 2>&1

echo "[perf4] mppi smoke $(date)" >> $LOG
timeout 1200 python bench.py --mppi slotmm bf16 > /tmp/mppi_smoke_r4.log 2>&1
echo "[perf4] mppi smoke rc=$? $(date)" >> $LOG
grep MPPI_RESULT /tmp/mppi_smoke_r4.log >> $LOG

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[perf4] single-env frame parts $(date)" >> $LOG
timeout 900 python scripts/bench_frame_parts.py > /tmp/frame_parts_r4.log 2>&1
echo "[perf4] frame parts rc=$? $(date)" >> $LOG

bash scripts/tpu_watch.sh >> $LOG 2>&1
echo "[perf4] batched scaling $(date)" >> $LOG
ADAPTIGRAPH_PROF_ENVS=1,2,4,8 timeout 1500 \
  python scripts/bench_frame_parts.py --batch > /tmp/frame_batch_r4.log 2>&1
echo "[perf4] batched scaling rc=$? $(date)" >> $LOG

echo "[perf4] perf window done; chaining into back half $(date)" >> $LOG
exec bash scripts/run_round4_rest.sh
