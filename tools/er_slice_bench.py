"""Per-chip term of the ER multi-chip projection, measured on the real chip.

VERDICT r3 weak #7: the 2-6 B edges/s v5e-16 projection for locality-free
(ER) graphs rested on a roofline argument plus the CPU-mesh observation
that halo partitioning splits gather work 1/P — but no real-chip
measurement of a 1/P-sized slice backed the per-chip term.  This bench
closes that: for P in {1, 4, 8, 16} it builds the per-chip ELL workload an
edge-partitioned ER graph induces — n/P destination rows, full degree d
per row (every incoming edge is owned by the destination shard), sources
gathered from the local+halo space, which for a locality-free graph is
itself ~uniformly random — and measures the ELL forward on the single
v5e.  Projection per pod size: P x the measured per-slice rate, minus the
halo all_to_all (measured separately per-layer on the CPU mesh; bytes =
P*h_max*width*4 per chip, BASELINE.md round-3 table).

Relay rules (CLAUDE.md): chained inputs, short bursts, best-of-batches.

Usage: python tools/er_slice_bench.py [--n 200000] [--deg 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_er(n, deg, seed=3):
    rng = np.random.default_rng(seed)
    m = n * deg // 2
    u = rng.integers(0, n, size=int(m * 1.25))
    v = rng.integers(0, n, size=int(m * 1.25))
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    keep = lo != hi
    edges = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)[:m]
    w = rng.integers(1, 1001, size=n)
    from gnn_mwvc_tpu.graph import Graph

    return Graph(w, edges)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--parts", default="1,4,8,16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--out", default="/tmp/er_slice_bench.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gnn_mwvc_tpu.graph import DeviceGraph
    from gnn_mwvc_tpu.models import load_pretrained
    from gnn_mwvc_tpu.models.gnn import Model, forward

    model = load_pretrained()
    kinds, name = model.kinds, model.name
    rows = []
    for p in map(int, args.parts.split(",")):
        n_slice = args.n // p
        g = build_er(n_slice, args.deg, seed=3 + p)
        dg = DeviceGraph.from_graph(g, aggregation="ell")
        ws = float(g.weights.max())

        @jax.jit
        def step(xcol, params, dg, weight_scale):
            x = (dg.weights / weight_scale).reshape(-1, 1) + xcol * 1e-12
            out = forward(
                Model(kinds=kinds, params=params, name=name),
                x.astype(jnp.float32), dg, weight_scale,
                x_is_node_weights=True,
            )
            return out[:, :1]

        xcol = jnp.zeros((dg.n_pad, 1), jnp.float32)
        t0 = time.perf_counter()
        xcol = step(xcol, model.params, dg, jnp.float32(ws))
        jax.block_until_ready(xcol)
        t_load = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(args.batches):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                xcol = step(xcol, model.params, dg, jnp.float32(ws))
            jax.block_until_ready(xcol)
            dt = min(dt, (time.perf_counter() - t0) / args.iters)
            time.sleep(1.0)
        rate = dg.e / dt
        rows.append({
            "parts": p, "n_slice": n_slice, "e_slice": int(dg.e),
            "per_slice_edges_per_s": round(rate),
            "projected_pod_edges_per_s": round(rate * p),
            "t_load_s": round(t_load, 1), "t_iter_ms": round(dt * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    out = {"n": args.n, "deg": args.deg,
           "device": str(jax.devices()[0]), "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
