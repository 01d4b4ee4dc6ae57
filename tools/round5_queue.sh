#!/bin/bash
# Round-5 measurement agenda (VERDICT r4 "Next round" #2/#3/#5): the
# machinery was all built in rounds 3-4; this queue EXECUTES it, in
# priority order, each timed run behind the relay-health gate
# (tools/relay_probe.py).  A sick window retries after 15 min rather than
# recording an outage loss (CLAUDE.md: schedule head-to-heads in a healthy
# window).  Run from the repo root:  bash tools/round5_queue.sh
set -u
cd "$(dirname "$0")/.."
REC=tools/records

run_gated() {  # retry a probe-gated command until the window is healthy
  local tries=0
  until "$@"; do
    tries=$((tries + 1))
    if [ "$tries" -ge 8 ]; then
      echo "QUEUE: giving up after $tries tries: $*"
      return 1
    fi
    echo "QUEUE: sick window or failure; retry $tries in 900s: $*"
    sleep 900
  done
}

echo "QUEUE: start $(date -u +%FT%TZ)"

# 1. road1600 canonical redo, 2 seeds (the round-3 open item: 1 win /
#    2 relay-outage losses; reference best 879,318,891)
run_gated timeout 2400 python tools/canonical.py road1600 --seed 1 \
  --tag r5a --out "$REC/canonical_road1600_r5a.json"
run_gated timeout 2400 python tools/canonical.py road1600 --seed 2 \
  --tag r5b --out "$REC/canonical_road1600_r5b.json"

# 2. rmax 14-vs-20 A/B on a fresh road900 kernel (settles the
#    assist_rmax default; r3 left one live pairing)
timeout 1200 python tools/dump_kernel.py road900 \
  --out /tmp/kernel_road900_r5.npz || echo "QUEUE: kernel dump failed"
if [ -f /tmp/kernel_road900_r5.npz ]; then
  run_gated timeout 2400 python tools/assist_ab.py \
    /tmp/kernel_road900_r5.npz --time 300 --seeds 1,2 --variants full \
    --rmax 20 --out "$REC/assist_ab_rmax20_r5.json"
  run_gated timeout 2400 python tools/assist_ab.py \
    /tmp/kernel_road900_r5.npz --time 300 --seeds 1,2 --variants full \
    --rmax 14 --out "$REC/assist_ab_rmax14_r5.json"
fi

# 3. healthy-window assisted road1200 (prove batches_device > 0 in
#    production through the outage-proof worker)
run_gated timeout 2400 python tools/canonical.py road1200 --seed 1 \
  --tag r5assist --out "$REC/canonical_road1200_r5assist.json"

# 4. real-chip per-slice ER measurement (restates the v5e-16 ER
#    projection as extrapolation-from-measurement)
timeout 3000 python tools/er_slice_bench.py --out "$REC/er_slice_r5.json" \
  || echo "QUEUE: er_slice_bench failed"

# 5. CPU-mesh canonical parity records (promised by the round-4 commit
#    message; CPU-only, so last — keeps the 2 host CPUs free during the
#    timed device runs above)
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 1800 python tools/sharded_solve.py road300 --parts 8 \
  --out "$REC/sharded_solve_road300_r5.json" \
  || echo "QUEUE: sharded_solve road300 failed"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3600 python tools/sharded_solve.py road700 --parts 8 \
  --out "$REC/sharded_solve_road700_r5.json" \
  || echo "QUEUE: sharded_solve road700 failed"

echo "QUEUE: done $(date -u +%FT%TZ)"
