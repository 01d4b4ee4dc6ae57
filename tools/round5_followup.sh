#!/bin/bash
# After tools/road1600_redo.sh finishes (2 wins or gave up), refresh the
# road900 and road700 canonical records on the round-5 stack (native
# deltas + native CPU forward + dual-worker assist at rmax 20), each
# behind the default relay gate with retry.
set -u
cd "$(dirname "$0")/.."
REC=tools/records

run_gated() {
  local tries=0
  until "$@"; do
    tries=$((tries + 1))
    if [ "$tries" -ge 6 ]; then
      echo "FOLLOWUP: giving up: $*"
      return 1
    fi
    echo "FOLLOWUP: sick window; retry $tries in 900s: $*"
    sleep 900
  done
}

run_gated timeout 2400 python tools/canonical.py road900 --seed 1 \
  --tag r5 --out "$REC/canonical_road900_r5.json"
run_gated timeout 2400 python tools/canonical.py road700 --seed 1 \
  --tag r5 --out "$REC/canonical_road700_r5.json"
echo "FOLLOWUP: done $(date -u +%FT%TZ)"
