#!/bin/sh
# Poll until the TPU serves a trivial op; print recovery time.
start=$(date +%s)
while true; do
  if PYTHONPATH=/root/repo:/root/.axon_site timeout 90 python -c "import jax.numpy as j; print(float(j.sum(j.ones((4,4)))))" >/dev/null 2>&1; then
    echo "TPU RECOVERED after $(( $(date +%s) - start ))s"
    break
  fi
  sleep 30
done
