#!/bin/bash
# Restore git-durable compact episodes (scripts/compact_episodes.py) back
# under data/sim_data after a VM reset. Never clobbers an existing file:
# richer image-bearing originals win over their compact mirrors.
set -u
cd /root/repo
SRC=${1:-data/compact}
DST=${2:-data/sim_data}
[ -d "$SRC" ] || { echo "no $SRC"; exit 0; }
n=0
while IFS= read -r -d '' f; do
  rel=${f#"$SRC"/}
  out="$DST/$rel"
  if [ ! -e "$out" ]; then
    mkdir -p "$(dirname "$out")"
    cp -p "$f" "$out"
    n=$((n + 1))
  fi
done < <(find "$SRC" -type f \( -name '*.h5' -o -name '*.pkl' -o -name '*.npy' \) -print0)
echo "restored $n files from $SRC to $DST"
