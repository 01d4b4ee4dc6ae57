#!/bin/bash
# road1600 strict-window redo: run canonical road1600 seeds until TWO
# healthy-window wins vs the reference best (879,318,891) are recorded,
# gated at probe_ms <= 58 (the 32-54 ms healthy band edge — the r5a run
# at a 66 ms probe spent 485 s in phase 1 and lost by +0.003%).
# Launched after tools/round5_queue.sh finishes.
set -u
cd "$(dirname "$0")/.."
REC=tools/records
REF_BEST=879318891

wins() {
  python - <<'EOF'
import glob, json
n = 0
for f in glob.glob("tools/records/canonical_road1600_r5*.json"):
    r = json.load(open(f))
    if r.get("written", 1 << 62) < 879318891:
        n += 1
print(n)
EOF
}

attempt=0
seed=3
while [ "$(wins)" -lt 2 ] && [ "$attempt" -lt 10 ]; do
  attempt=$((attempt + 1))
  tag="r5s${seed}"
  if timeout 2400 python tools/canonical.py road1600 --seed "$seed" \
      --tag "$tag" --probe-ms-max 58 \
      --out "$REC/canonical_road1600_${tag}.json"; then
    seed=$((seed + 1))
  else
    echo "REDO: sick window or failure (attempt $attempt); sleeping 900s"
    sleep 900
  fi
done
echo "REDO: done, wins=$(wins) after $attempt attempts"
