#!/bin/bash
# Last measurement pass of round 5: road1200 on the full round-5 stack
# (the r5assist record started before the rmax-20 dual-worker assist
# landed).  Runs after tools/round5_followup.sh finishes.
set -u
cd "$(dirname "$0")/.."
REC=tools/records

run_gated() {
  local tries=0
  until "$@"; do
    tries=$((tries + 1))
    if [ "$tries" -ge 5 ]; then
      echo "FINAL: giving up: $*"
      return 1
    fi
    echo "FINAL: sick window; retry $tries in 900s: $*"
    sleep 900
  done
}

run_gated timeout 2400 python tools/canonical.py road1200 --seed 2 \
  --tag r5b --out "$REC/canonical_road1200_r5b.json"
echo "FINAL: done $(date -u +%FT%TZ)"
