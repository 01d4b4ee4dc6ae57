"""Sticky scoring (static device structure + masked re-score)."""

import numpy as np

from gnn_mwvc_tpu.core import CoreSolver
from gnn_mwvc_tpu.graphio import cover_cost, is_vertex_cover
from gnn_mwvc_tpu.solver.pipeline import GnnScorer, solve
from gnn_mwvc_tpu.solver.static_score import StickyGnnScorer
from tests.conftest import random_graph


def test_sticky_matches_fresh_after_removals():
    """After plain node removals (no folds) the masked re-score over the
    stale structure must match a fresh-snapshot score on every active node."""
    g = random_graph(800, 8, seed=3, wmax=100)
    ws = float(g.weights.max())
    core = CoreSolver(g.weights, g.edge_array(), num_rules=0)

    sticky = StickyGnnScorer(force_sticky=True)
    ids0, prob0, w0, d0 = sticky.score_core(core, ws)
    assert len(ids0) == core.active_count

    # remove ~15% of nodes through real decisions (undo-able surgery)
    rng = np.random.default_rng(0)
    removed = 0
    for u in rng.permutation(g.n):
        if removed > g.n * 0.15:
            break
        if core.is_active(u):
            if rng.random() < 0.5:
                core.select_node(int(u))
            else:
                core.select_neighborhood(int(u))
            removed = g.n - core.active_count

    ids_s, prob_s, _w, _d = sticky.score_core(core, ws)
    assert sticky.stats["rebuilds"] == 1  # no rebuild: same static structure

    fresh = GnnScorer()
    snap = core.snapshot()
    prob_f = fresh(snap, ws)
    m = {int(i): float(p) for i, p in zip(snap.ids, prob_f)}
    assert set(map(int, ids_s)) == set(m)
    for i, p in zip(ids_s, prob_s):
        assert abs(float(p) - m[int(i)]) < 2e-4, (int(i), float(p), m[int(i)])


def test_sticky_rebuild_trigger():
    g = random_graph(600, 6, seed=5, wmax=50)
    ws = float(g.weights.max())
    core = CoreSolver(g.weights, g.edge_array(), num_rules=0)
    sticky = StickyGnnScorer(rebuild_active_frac=0.5, force_sticky=True)
    sticky.score_core(core, ws)
    # decide >50% of nodes -> next score must rebuild
    for u in range(g.n):
        if core.active_count <= g.n * 0.4:
            break
        if core.is_active(u):
            core.select_node(u)
    ids, prob, _w, _d = sticky.score_core(core, ws)
    assert sticky.stats["rebuilds"] == 2
    assert len(ids) == core.active_count


def test_solve_sticky_default_end_to_end():
    for seed in (1, 4):
        g = random_graph(2000, 10, seed=seed, wmax=200)
        from gnn_mwvc_tpu.solver.static_score import StickyGnnScorer as S
        res_sticky = solve(g, time_limit=1.5, scorer=S(force_sticky=True))
        res_legacy = solve(g, time_limit=1.5, scorer=GnnScorer())
        assert is_vertex_cover(g, res_sticky.solution)
        assert cover_cost(g, res_sticky.solution) == res_sticky.cost
        # same trajectory class: costs agree within local-search noise
        assert res_sticky.cost <= res_legacy.cost * 1.01


def test_warm_overlap_end_to_end():
    """warm_overlap dispatches the first device call off-thread and scores
    the in-flight rounds with the exact CPU forward; the solve must stay
    valid and the scorer must converge to the sticky path once warmed."""
    g = random_graph(2000, 10, seed=1, wmax=200)
    scorer = StickyGnnScorer(force_sticky=True, warm_overlap=True,
                             warm_wait_s=0.0)
    res = solve(g, time_limit=1.5, scorer=scorer)
    assert is_vertex_cover(g, res.solution)
    assert cover_cost(g, res.solution) == res.cost
    # at least the dispatch round fell back to the CPU stopgap
    assert scorer.stats.get("overlap_rounds", 0) >= 1
    # the warmup call was harvested (or is still pending if phase 1 was
    # one round long); once harvested the sticky path served later rounds
    if scorer._warmed:
        assert "t_warmup_s" in scorer.stats
        assert scorer._bufs is not None


def test_warm_overlap_fast_load_uses_device_result():
    """When the program loads within warm_wait_s the dispatch round's own
    device result is used directly — no CPU stopgap round at all."""
    g = random_graph(800, 8, seed=3, wmax=100)
    ws = float(g.weights.max())
    core = CoreSolver(g.weights, g.edge_array(), num_rules=0)
    warm = StickyGnnScorer(force_sticky=True, warm_overlap=True,
                           warm_wait_s=60.0)
    ids, prob, _, _ = warm.score_core(core, ws)
    assert warm._warmed
    assert warm.stats.get("overlap_rounds", 0) == 0
    plain = StickyGnnScorer(force_sticky=True, warm_overlap=False)
    ids_p, prob_p, _, _ = plain.score_core(core, ws)
    assert np.array_equal(ids, ids_p)
    assert np.allclose(prob, prob_p, atol=1e-6)


def test_warm_overlap_scores_match_sticky():
    """CPU stopgap scores and sticky scores agree on the same core state."""
    g = random_graph(800, 8, seed=11, wmax=100)
    ws = float(g.weights.max())
    core = CoreSolver(g.weights, g.edge_array(), num_rules=0)

    warm = StickyGnnScorer(force_sticky=True, warm_overlap=True,
                           warm_wait_s=0.0)
    ids_w, prob_w, _, _ = warm.score_core(core, ws)  # dispatches + CPU scores
    plain = StickyGnnScorer(force_sticky=True, warm_overlap=False)
    ids_p, prob_p, _, _ = plain.score_core(core, ws)
    mw = {int(i): float(p) for i, p in zip(ids_w, prob_w)}
    for i, p in zip(ids_p, prob_p):
        assert abs(float(p) - mw[int(i)]) < 2e-4
    # harvest and verify the warmed path serves the next round
    warm._pending["thread"].join()
    ids2, prob2, _, _ = warm.score_core(core, ws)
    assert warm._warmed
    mp = {int(i): float(p) for i, p in zip(ids_p, prob_p)}
    for i, p in zip(ids2, prob2):
        assert abs(float(p) - mp[int(i)]) < 2e-4


def test_shape_templated_rebuild_same_program_shapes():
    """A rebuild fitted into the previous build's template must produce an
    identical jit cache key (same pytree structure, shapes, statics)."""
    import jax

    from gnn_mwvc_tpu.graph import DeviceGraph

    g = random_graph(3000, 8, seed=9, wmax=100)
    dg0 = DeviceGraph.from_graph(g, aggregation="blocked")
    # subgraph: drop the last third of the nodes
    keep = np.arange(g.n) < 2 * g.n // 3
    gs = _induced(g, keep)
    dgt = DeviceGraph.build(
        gs.weights, gs.indptr.astype(np.int64), gs.indices.astype(np.int64),
        shape_template=dg0,
    )
    assert dgt is not None
    s0 = jax.tree_util.tree_structure(dg0)
    s1 = jax.tree_util.tree_structure(dgt)
    assert s0 == s1
    l0 = jax.tree_util.tree_leaves(dg0)
    l1 = jax.tree_util.tree_leaves(dgt)
    assert [np.shape(a) for a in l0] == [np.shape(a) for a in l1]
    assert [np.asarray(a).dtype for a in l0] == [np.asarray(a).dtype for a in l1]

    # and the templated aggregation is correct for the subgraph
    from gnn_mwvc_tpu.ops.blocked import blocked_segment_sum

    x = np.zeros((dgt.n_pad, 4), np.float32)
    rng = np.random.default_rng(0)
    x[: gs.n] = rng.standard_normal((gs.n, 4)).astype(np.float32)
    agg = np.asarray(blocked_segment_sum(np.asarray(x), dgt.blocked))[: gs.n]
    want = np.zeros((gs.n, 4), np.float32)
    for u in range(gs.n):
        for v in gs.indices[gs.indptr[u]:gs.indptr[u + 1]]:
            want[u] += x[v]
    assert np.allclose(agg, want, atol=1e-4)


def _induced(g, keep_mask):
    from gnn_mwvc_tpu.graph import Graph

    ids = np.nonzero(keep_mask)[0]
    remap = -np.ones(g.n, np.int64)
    remap[ids] = np.arange(len(ids))
    e = g.edge_array()
    ek = e[keep_mask[e[:, 0]] & keep_mask[e[:, 1]]]
    return Graph(g.weights[ids], remap[ek])


def test_relay_bail_policy():
    """Relay-outage bail state machine (round 3c): two consecutive device
    rounds slower per edge than the CPU forward flip to CPU routing;
    every 4th sick round probes the device; a fast probe clears it."""
    s = StickyGnnScorer.__new__(StickyGnnScorer)  # policy state only
    s.stats = {}
    s._relay_sick = False
    s._dev_slow_streak = 0
    s._sick_round_ctr = 0
    s._probe_ok_streak = 0
    s._cpu_samples = []

    s._note_cpu_round(4.0, 8_000_000)          # CPU: 0.5 us/edge
    assert s._cpu_estimate() == 4.0 / 8_000_000

    # healthy device: 100x faster than CPU
    assert s._note_device_round(0.04, 8_000_000)
    assert not s._relay_sick
    # one slow round (program load, hiccup): no trigger
    assert s._note_device_round(30.0, 8_000_000)
    assert s._dev_slow_streak == 1 and not s._relay_sick
    s._note_device_round(0.04, 8_000_000)       # recovers -> streak resets
    assert s._dev_slow_streak == 0

    # outage: two consecutive slower-than-CPU rounds trip the bail
    s._note_device_round(25.0, 8_000_000)
    assert not s._relay_sick
    s._note_device_round(25.0, 8_000_000)
    assert s._relay_sick and s.stats["relay_bails"] == 1

    # rounds 1-3 route to CPU, round 4 probes the device
    routed = [s._route_cpu_this_round() for _ in range(4)]
    assert routed == [True, True, True, False]
    assert s.stats["relay_sick_rounds"] == 3

    # probe still slow -> stays sick; next 3 rounds still CPU
    s._note_device_round(20.0, 8_000_000)
    assert s._relay_sick
    assert [s._route_cpu_this_round() for _ in range(4)] == [
        True, True, True, False]

    # probe fast (under half the CPU rate) -> healthy again
    s._note_device_round(0.05, 8_000_000)
    assert not s._relay_sick
    assert not s._route_cpu_this_round()

    # without a measured CPU round the 4M-edges/s floor calibrates
    s2 = StickyGnnScorer.__new__(StickyGnnScorer)
    s2.stats = {}
    s2._relay_sick = False
    s2._dev_slow_streak = 0
    s2._sick_round_ctr = 0
    s2._probe_ok_streak = 0
    s2._cpu_samples = []
    s2._note_device_round(3.0, 8_000_000)       # 1.5x the floor estimate
    s2._note_device_round(3.0, 8_000_000)
    assert s2._relay_sick


def test_relay_bail_calibration_robust_and_hysteresis_clears():
    """Round-4 policy refinements (ADVICE r3 #2/#3): the CPU estimate is
    the median of recent rounds, and a relay recovered only to parity
    (0.5-1.0x CPU) clears the sick state after two consecutive at-parity
    probes instead of staying pinned on the host."""
    s = StickyGnnScorer.__new__(StickyGnnScorer)
    s.stats = {}
    s._relay_sick = False
    s._dev_slow_streak = 0
    s._sick_round_ctr = 0
    s._probe_ok_streak = 0
    s._cpu_samples = []

    # one contended outlier (10x) must not skew the median estimate
    for _ in range(3):
        s._note_cpu_round(4.0, 8_000_000)
    s._note_cpu_round(40.0, 8_000_000)
    assert s._cpu_estimate() == 4.0 / 8_000_000
    # ...and only the last CPU_SAMPLES_KEPT samples are kept
    for _ in range(5):
        s._note_cpu_round(8.0, 8_000_000)
    assert s._cpu_estimate() == 8.0 / 8_000_000

    # trip the bail
    s._note_device_round(30.0, 8_000_000)
    s._note_device_round(30.0, 8_000_000)
    assert s._relay_sick

    # probes at 0.75x CPU (dead band under the old policy): the second
    # consecutive at-parity probe clears the sick state
    s._note_device_round(6.0, 8_000_000)
    assert s._relay_sick and s._probe_ok_streak == 1
    s._note_device_round(6.0, 8_000_000)
    assert not s._relay_sick

    # a slow round between at-parity probes resets the streak
    s._note_device_round(30.0, 8_000_000)
    s._note_device_round(30.0, 8_000_000)
    assert s._relay_sick
    s._note_device_round(6.0, 8_000_000)
    s._note_device_round(30.0, 8_000_000)   # relapse
    assert s._probe_ok_streak == 0 and s._relay_sick
    # decisive fast probe still clears immediately
    s._note_device_round(0.05, 8_000_000)
    assert not s._relay_sick
