"""Benchmark driver: GNN scoring throughput (directed edges/s) on one chip.

Prints ONE JSON line:
  {"metric": "gnn_score_edges_per_s", "value": N, "unit": "edges/s",
   "vs_baseline": R}

Metric definition: directed edges processed per full 21-layer inference
(3 message-passing rounds over E directed edges each, exactly what the
reference's m.predict does per call, reference: src/GNN_VC.cpp:188-192),
divided by wall time per inference on the current default device.

vs_baseline compares against the reference C++ implementation measured on
this machine's CPU via tests/oracle/bench_predict (single-threaded, real
OpenBLAS sgemm, -O3 -march=native): 3_200_000 directed edges / 0.406943 s =
7.86e6 edges/s (200k nodes, avg degree 16, 2026-08-17).  If the oracle binary
is present it is re-measured live; otherwise the recorded constant is used.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_EDGES_PER_S = 7.86e6  # measured locally; see module docstring
ORACLE = "/tmp/gnn_mwvc_oracle/bench_predict"
ORACLE_GRAPH = "/tmp/gnn_mwvc_oracle/bench200k.metis"


def build_graph(n, avg_deg, seed=42):
    rng = np.random.default_rng(seed)
    m = n * avg_deg // 2
    u = rng.integers(0, n, size=int(m * 1.15))
    v = rng.integers(0, n, size=int(m * 1.15))
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    keep = lo != hi
    edges = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)[:m]
    weights = rng.integers(1, 1001, size=n)
    from gnn_mwvc_tpu.graph import Graph

    return Graph(weights, edges)


def measure_reference():
    """Re-measure the reference CPU baseline when the oracle is available."""
    if not (os.path.exists(ORACLE) and os.path.exists(ORACLE_GRAPH)):
        return REFERENCE_EDGES_PER_S
    try:
        out = subprocess.run(
            [ORACLE, ORACLE_GRAPH, "3"],
            capture_output=True, text=True, timeout=300, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sec, e = out.stdout.split()
        return float(e) / float(sec)
    except Exception:
        return REFERENCE_EDGES_PER_S


def main():
    n = int(os.environ.get("BENCH_NODES", 2_000_000))
    avg_deg = int(os.environ.get("BENCH_DEG", 16))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    import jax
    import jax.numpy as jnp

    from gnn_mwvc_tpu.graph import DeviceGraph
    from gnn_mwvc_tpu.models import load_pretrained
    from gnn_mwvc_tpu.models.gnn import Model, forward

    g = build_graph(n, avg_deg)
    dg = DeviceGraph.from_graph(g)
    model = load_pretrained()
    ws = float(g.weights.max())
    kinds, name = model.kinds, model.name

    # Chain each iteration's input on the previous output so the runtime
    # cannot cache/elide repeated identical executions.
    @jax.jit
    def step(xcol, params, dg, weight_scale):
        x = (dg.weights / weight_scale).reshape(-1, 1) + xcol * 1e-12
        out = forward(
            Model(kinds=kinds, params=params, name=name),
            x.astype(jnp.float32), dg, weight_scale,
            precision=jax.lax.Precision.DEFAULT,
        )
        return out[:, :1]

    xcol = jnp.zeros((dg.n_pad, 1), jnp.float32)
    xcol = step(xcol, model.params, dg, jnp.float32(ws))
    jax.block_until_ready(xcol)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        xcol = step(xcol, model.params, dg, jnp.float32(ws))
    jax.block_until_ready(xcol)
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = dg.e / dt
    ref = measure_reference()
    result = {
        "metric": "gnn_score_edges_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / ref, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
