#!/bin/bash
# Durable-data loop: every INTERVAL seconds mirror new episodes into
# data/compact (positions-only, git-committed) so a VM reset can never
# wipe campaign progress again (VERDICT r3 weak #6). Runs alongside the
# campaign; git index.lock races with interactive commits just skip one
# sweep (the next one catches up).
set -u
cd /root/repo
INTERVAL=${INTERVAL:-600}
END=${END:-0}   # epoch secs; 0 = run forever
while :; do
  python scripts/compact_episodes.py --commit >> /tmp/durable_commit.log 2>&1
  [ "$END" -gt 0 ] && [ "$(date +%s)" -ge "$END" ] && break
  sleep "$INTERVAL"
done
echo "[durable] done $(date)" >> /tmp/durable_commit.log
