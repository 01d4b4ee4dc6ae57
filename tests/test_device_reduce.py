"""Device-guided bulk reduction prepass: exactness preservation."""

import numpy as np

from gnn_mwvc_tpu.core import CoreSolver
from gnn_mwvc_tpu.graphio import cover_cost, is_vertex_cover
from gnn_mwvc_tpu.solver.device_reduce import device_reduce_prepass
from tests.test_core import brute_force_mwvc, small_random


def test_prepass_preserves_exactness():
    for seed in (1, 2, 3):
        g = small_random(14, 0.3, seed)
        core = CoreSolver(g.weights, g.edge_array())
        stats = device_reduce_prepass(core, min_nodes=0)
        core.reduce(critical=True)
        core.solve_small_components(75)
        assert core.active_count == 0
        core.unfold(0)
        sol = core.solution()
        assert is_vertex_cover(g, sol)
        assert cover_cost(g, sol) == core.cost == brute_force_mwvc(g)


def test_prepass_applies_on_structured_graph():
    # star-heavy graph: many r1 candidates (leaf-dominated centers)
    from gnn_mwvc_tpu.graph import Graph

    rng = np.random.default_rng(0)
    edges = []
    n = 4000
    # 200 stars of 19 leaves each + random extra edges
    for c in range(0, n, 20):
        for leaf in range(c + 1, min(c + 20, n)):
            edges.append((c, leaf))
    w = rng.integers(1, 10, size=n)
    w[::20] = 1000  # heavy centers: NW(center) < W? no — leaves light
    g = Graph(w, np.array(edges))
    core = CoreSolver(g.weights, g.edge_array())
    stats = device_reduce_prepass(core, min_nodes=0, max_rounds=2)
    # centers have NW = sum of ~19 light leaves < 1000 -> r1 fires on device
    assert stats["r1_applied"] > 100
    core.reduce(critical=False)
    core.solve_small_components(75)
    core.unfold(0)
    sol = core.solution()
    assert is_vertex_cover(g, sol)


def test_prepass_twin_folding():
    from gnn_mwvc_tpu.graph import Graph

    # many twin pairs: i and i+1 share neighborhoods {base, base+1}
    edges = []
    n = 300
    for i in range(0, 200, 2):
        a, b = 200 + (i % 100), 200 + ((i + 7) % 100)
        edges.append((i, a))
        edges.append((i, b))
        edges.append((i + 1, a))
        edges.append((i + 1, b))
    w = np.full(n, 7)
    g = Graph(w, np.unique(np.array(edges), axis=0))
    core = CoreSolver(g.weights, g.edge_array())
    stats = device_reduce_prepass(core, min_nodes=0, max_rounds=1)
    assert stats["twins_applied"] > 10
    core.reduce(critical=False)
    core.solve_small_components(400)
    core.unfold(0)
    sol = core.solution()
    assert is_vertex_cover(g, sol)
    assert cover_cost(g, sol) == core.cost
