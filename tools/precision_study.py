"""Round-3 precision study (VERDICT item 2): measure, on the real TPU and
the bench road graph, the throughput AND score error of the three candidate
scoring configurations:

  * highest — fp32 MXU passes everywhere (dots + windowed-aggregation
    einsums); the activation-parity-clean config.
  * mixed   — dots at HIGHEST, aggregation einsums at backend default
    (what round-2 production shipped, implicitly).
  * default — single-pass bf16 MXU everywhere (what round-2 bench.py ran).

Ground truth is the CPU fp32 scatter-path forward (exact, the config the
2e-5 activation-parity tests certify against the C++ reference).

Writes /tmp/precision_study.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    side = int(os.environ.get("BENCH_SIDE", 1200))
    iters = int(os.environ.get("BENCH_ITERS", 5))
    batches = int(os.environ.get("BENCH_BATCHES", 4))

    import jax
    import jax.numpy as jnp

    from bench import build_road_graph
    from gnn_mwvc_tpu.core import cluster_order
    from gnn_mwvc_tpu.graph import DeviceGraph
    from gnn_mwvc_tpu.models import load_pretrained
    from gnn_mwvc_tpu.models.gnn import Model, forward
    from gnn_mwvc_tpu.solver.pipeline import pick_devices

    cpu, tpu = pick_devices()
    assert tpu is not None, "precision study needs the TPU"

    g = build_road_graph(side)
    perm = cluster_order(g.indptr, g.indices)
    g = g.reorder(perm)
    model = load_pretrained()
    ws = np.float32(g.weights.max())
    kinds, name = model.kinds, model.name

    # ground truth: CPU fp32 scatter path (the parity-tested config)
    print("CPU fp32 ground truth...", flush=True)
    dg_cpu = DeviceGraph.from_graph(g, aggregation="scatter")
    with jax.default_device(cpu):
        dg_c = jax.device_put(dg_cpu, cpu)
        x = (dg_c.weights / ws).reshape(-1, 1).astype(jnp.float32)
        ref = np.asarray(
            forward(model, x, dg_c, ws, x_is_node_weights=True)[: g.n, 0]
        )

    dg = DeviceGraph.from_graph(g, aggregation="auto")
    dg_t = jax.device_put(dg, tpu)
    e = dg.e

    results = {"side": side, "n": int(g.n), "e_directed": int(e)}
    for tag, dot_p, agg_p in [
        ("highest", jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST),
        ("mixed", jax.lax.Precision.HIGHEST, None),
        ("default", jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT),
    ]:
        # distinct precisions for dots vs aggregation need the raw pieces:
        # replicate forward but with per-site precision
        def fwd(params, xcol, dgx, weight_scale, dot_p=dot_p, agg_p=agg_p):
            from gnn_mwvc_tpu.models.gnn import graph_layer

            m = Model(kinds=kinds, params=params, name=name)
            h = (dgx.weights / weight_scale).reshape(-1, 1).astype(
                jnp.float32) + xcol * 1e-12
            first = True
            for kind, p in zip(m.kinds, m.params):
                if kind == "linear":
                    h = (jnp.dot(h, p["w"],
                                 preferred_element_type=jnp.float32,
                                 precision=dot_p) + p["b"]).astype(h.dtype)
                elif kind == "relu":
                    h = jnp.maximum(h, 0)
                elif kind == "sigmoid":
                    h = jax.nn.sigmoid(h)
                else:
                    agg = None
                    if first:
                        agg = (dgx.nw / weight_scale).reshape(-1, 1).astype(
                            h.dtype)
                        first = False
                    h = graph_layer(
                        h, dgx.row, dgx.col, dgx.degrees, dgx.weights,
                        dgx.nw, weight_scale, compat=True, ell=dgx.ell,
                        agg=agg, blocked=dgx.blocked, precision=agg_p,
                    )
            return h[:, :1]

        step = jax.jit(fwd)
        t_load0 = time.perf_counter()
        xcol = jnp.zeros((dg.n_pad, 1), jnp.float32,
                         device=tpu)
        xcol = step(model.params, xcol, dg_t, ws)
        jax.block_until_ready(xcol)
        t_load = time.perf_counter() - t_load0
        scores = np.asarray(xcol)[: g.n, 0]
        err = np.abs(scores - ref)
        dt = float("inf")
        for _ in range(batches):
            t0 = time.perf_counter()
            for _ in range(iters):
                xcol = step(model.params, xcol, dg_t, ws)
            jax.block_until_ready(xcol)
            dt = min(dt, (time.perf_counter() - t0) / iters)
        results[tag] = {
            "edges_per_s": round(e / dt),
            "ms_per_forward": round(dt * 1e3, 2),
            "first_call_s": round(t_load, 1),
            "max_abs_err": float(err.max()),
            "mean_abs_err": float(err.mean()),
            "frac_gt_2e-5": float((err > 2e-5).mean()),
        }
        print(tag, json.dumps(results[tag]), flush=True)

    with open("/tmp/precision_study.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
