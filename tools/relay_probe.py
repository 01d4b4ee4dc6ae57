"""Relay-health probe + gate for timed head-to-head runs.

CLAUDE.md's protocol rule — "schedule quality head-to-heads in a healthy
window (probe first)" — was not enforced by tooling in round 3, and 3 of
the round's canonical records landed inside a documented 2-hour relay
outage.  This module operationalizes the rule:

  * ``run_probe()`` spawns a SUBPROCESS that pays a fresh one-time device
    program load (the per-process cost every canonical run pays, 6-314 s
    healthy) and then measures a few chained executions of the production
    assist shape (pallas_small_mwvc, (1024, 16)); chaining inputs on the
    previous output defeats the relay's identical-execution elision.
  * Health criteria: the subprocess finishes within ``timeout_s`` (an
    outage wedges the load indefinitely — r3c/r3d recorded 0 assist
    batches in 700-1000 s), AND the median chained execution stays under
    ``iter_ms_max`` (healthy band 32-54 ms measured; the r3 outage
    collapsed execution 3-10x).
  * ``gate()`` is called by tools/canonical.py and tools/assist_ab.py:
    it stamps {relay_healthy, probe_ms, probe_load_s} into the run record
    and refuses to start a timed run in a sick window unless --force.

Probe cost is ~1-2 min on a healthy relay — noise against a 1000 s run,
and it pre-warms the compile cache for nothing (separate process), so the
probe is purely a measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ITER_MS_MAX = 150.0   # healthy band 32-54 ms for (1024,16) pallas n16
LOAD_TIMEOUT_S = 300  # one-time load: 6-314 s healthy, unbounded in outage

_CHILD = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc
rng = np.random.default_rng(7)
b, n = 1024, 16
adj = np.zeros((b, n), np.int32); w = np.zeros((b, n), np.int32)
for k in range(b):
    m = int(rng.integers(8, 17)); w[k, :m] = rng.integers(1, 1000, size=m)
    for _ in range(2 * m):
        i, j = rng.integers(0, m, size=2)
        if i != j:
            adj[k, i] |= 1 << j; adj[k, j] |= 1 << i
used = w > 0
t0 = time.perf_counter()
bc, bs = pallas_small_mwvc(adj, w); jax.block_until_ready((bc, bs))
load_s = time.perf_counter() - t0
iters = []
for _ in range(4):
    t0 = time.perf_counter()
    w = np.where(used, (w + (np.asarray(bs)[:, None] & 7)) %% 997 + 1,
                 0).astype(np.int32)
    bc, bs = pallas_small_mwvc(adj, w); jax.block_until_ready((bc, bs))
    iters.append((time.perf_counter() - t0) * 1e3)
dev = jax.devices()[0]
print(json.dumps({"load_s": round(load_s, 1),
                  "iter_ms": [round(x, 1) for x in iters],
                  "platform": dev.platform}))
"""


def run_probe(timeout_s: float = LOAD_TIMEOUT_S,
              iter_ms_max: float = ITER_MS_MAX) -> dict:
    """Returns {relay_healthy, probe_ms, probe_load_s, probe_note}."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": repo}],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"relay_healthy": False, "probe_ms": None,
                "probe_load_s": None,
                "probe_note": f"probe timed out after {timeout_s:.0f}s "
                              "(one-time load never arrived)"}
    wall = time.perf_counter() - t0
    line = out.stdout.strip().splitlines()
    try:
        rec = json.loads(line[-1])
    except (IndexError, json.JSONDecodeError):
        return {"relay_healthy": False, "probe_ms": None,
                "probe_load_s": None,
                "probe_note": "probe crashed: "
                              + out.stderr.strip()[-400:]}
    if rec["platform"] == "cpu":
        # no accelerator visible: nothing to gate (CPU-only run)
        return {"relay_healthy": True, "probe_ms": None, "probe_load_s": None,
                "probe_note": "no accelerator; gate is a no-op"}
    iters = sorted(rec["iter_ms"])
    med = iters[len(iters) // 2]
    healthy = med <= iter_ms_max
    return {"relay_healthy": healthy, "probe_ms": med,
            "probe_load_s": rec["load_s"],
            "probe_note": f"load {rec['load_s']}s, median exec {med}ms, "
                          f"probe wall {wall:.0f}s"}


def gate(force: bool = False, skip: bool = False,
         iter_ms_max: float = ITER_MS_MAX) -> dict:
    """Probe and refuse to proceed in a sick window (unless force).

    skip=True records an explicit unprobed stamp (CPU-only tests).
    iter_ms_max: stricter thresholds for runs whose outcome is dominated
    by relay execution throughput — road1600's phase 1 measured 485 s at
    a 66 ms probe vs ~270 s in the 32-54 ms healthy band, which is the
    difference between a win and a +0.003% loss at the 1000 s cutoff."""
    if skip:
        return {"relay_healthy": None, "probe_ms": None, "probe_load_s": None,
                "probe_note": "probe skipped (--no-probe)"}
    rec = run_probe(iter_ms_max=iter_ms_max)
    print(f"relay probe: {rec['probe_note']}", flush=True)
    if not rec["relay_healthy"] and not force:
        raise SystemExit(
            "relay unhealthy: refusing to start a timed head-to-head "
            "(CLAUDE.md protocol); re-run with --force to override. "
            + rec["probe_note"])
    return rec


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=LOAD_TIMEOUT_S)
    args = ap.parse_args(argv)
    print(json.dumps(run_probe(timeout_s=args.timeout)))


if __name__ == "__main__":
    main()
