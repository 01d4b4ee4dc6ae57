"""Device-assisted phase 2 (round 3): region extraction, exact patching,
guided kicks, and the end-to-end assist loop."""

import numpy as np

from gnn_mwvc_tpu.core import CoreLocalSearch
from gnn_mwvc_tpu.graphio import cover_cost, is_vertex_cover
from gnn_mwvc_tpu.ops.smallsolve import batched_small_mwvc
from gnn_mwvc_tpu.solver.pipeline import solve
from tests.conftest import random_graph


def _path_ls():
    # path 0-1-2-3-4 with heavy endpoints in the cover; optimum is {1,3}
    w = np.array([10, 1, 10, 1, 10], np.uint32)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 4]], np.uint32)
    s0 = np.array([1, 0, 1, 0, 1], np.uint8)
    return CoreLocalSearch(w, edges, s0)


def test_extract_region_boundary_forcing():
    """A region vertex with an outside non-cover neighbor must carry a
    self-loop bit (forced into the cover)."""
    # star: center 0 with leaves 1..4; cover = {0}; extract rmax=2 around 0
    w = np.array([5, 1, 1, 1, 1], np.uint32)
    edges = np.array([[0, 1], [0, 2], [0, 3], [0, 4]], np.uint32)
    s0 = np.array([1, 0, 0, 0, 0], np.uint8)
    ls = CoreLocalSearch(w, edges, s0)
    ids, adj, wts, k = ls.extract_regions(np.array([0], np.uint32), rmax=2)
    kk = int(k[0])
    assert kk == 2
    # region = {0, leaf}; 0 has 3 outside non-cover leaves -> forced
    i0 = int(np.where(ids[0][:kk] == 0)[0][0])
    assert adj[0][i0] & (1 << i0)  # self-loop on the center
    bc, bs = batched_small_mwvc(adj, wts)
    assert int(bs[0]) & (1 << i0)  # exact solve keeps the forced vertex


def test_extract_regions_disjoint_within_batch():
    g = random_graph(500, 8, seed=1, wmax=50)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    centers = np.arange(0, 500, 7, dtype=np.uint32)
    ids, adj, wts, k = ls.extract_regions(centers, rmax=12)
    seen = set()
    for i in range(len(centers)):
        for v in ids[i][: int(k[i])]:
            assert int(v) not in seen  # no vertex claimed twice
            seen.add(int(v))


def test_apply_region_rejects_uncovering_and_nonimproving():
    ls = _path_ls()
    ids, adj, wts, k = ls.extract_regions(np.array([0], np.uint32), rmax=16)
    kk = int(k[0])
    # empty cover would uncover every edge -> reject
    assert not ls.apply_region(kk, ids[0][:kk], 0)
    # the incumbent assignment (no improvement) -> reject
    cur_mask = 0
    for i in range(kk):
        if ls.current()[ids[0][i]]:
            cur_mask |= 1 << i
    assert not ls.apply_region(kk, ids[0][:kk], cur_mask)
    # the exact optimum -> accepted, cost drops to 2
    bc, bs = batched_small_mwvc(adj, wts)
    assert ls.apply_region(kk, ids[0][:kk], int(bs[0]))
    assert ls.cost == int(bc[0]) == 2
    assert ls.commit_patches()
    assert ls.best_cost == 2


def test_apply_region_incremental_dscores_exact():
    """After a batch of applied patches the incrementally-maintained
    dscores must equal a from-scratch rebuild."""
    g = random_graph(600, 8, seed=9, wmax=50)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    ls.search(20000, 5.0)
    centers = np.arange(0, g.n, 11, dtype=np.uint32)
    ids, adj, wts, ks = ls.extract_regions(centers, rmax=12)
    bc, bs = batched_small_mwvc(adj, wts)
    applied = 0
    for i in range(len(centers)):
        k = int(ks[i])
        if k and ls.apply_region(k, ids[i, :k], int(bs[i])):
            applied += 1
    assert applied >= 1
    inc = ls.dscores().copy()
    ls.rebuild_scores()
    np.testing.assert_array_equal(inc, ls.dscores())


def test_perturb_guided_respects_bias_and_seed():
    g = random_graph(400, 6, seed=3, wmax=20)
    s0 = np.ones(g.n, np.uint8)
    ls1 = CoreLocalSearch(g.weights, g.edge_array(), s0)
    ls1.search(2000, 5.0)
    cover = ls1.current().copy()
    # bias 0 on a protected prefix: those vertices must never be removed
    bias = np.ones(g.n, np.float32)
    bias[:200] = 0.0
    ls1.perturb_guided(30, 42, bias)
    cur = ls1.current()
    assert np.array_equal(cur[:200] & cover[:200], cover[:200] & cover[:200])
    # determinism per seed
    ls2 = CoreLocalSearch(g.weights, g.edge_array(), s0)
    ls2.search(2000, 5.0)
    ls2.perturb_guided(30, 42, bias)
    assert np.array_equal(cur, ls2.current())


def test_device_assist_worker_round_trip():
    """The worker process solves a dispatched batch and its patches land."""
    import time

    from gnn_mwvc_tpu.solver.device_assist import DeviceAssist

    g = random_graph(800, 8, seed=5, wmax=100)
    s0 = np.ones(g.n, np.uint8)  # all-in cover: plenty to improve
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    assist = DeviceAssist(np.full(g.n, 0.5, np.float32), device="cpu",
                          batch=32, rmax=14)
    try:
        deadline = time.time() + 180  # spawn + jax import + CPU compile
        while assist.stats["batches"] == 0 and time.time() < deadline:
            assist.tick(ls)
            time.sleep(0.25)
        assert assist.stats["batches"] >= 1
        assert assist.stats["patches"] >= 1  # all-in cover is improvable
        assert assist.stats["gain"] > 0
    finally:
        assist.stop()


def test_solve_device_assist_end_to_end():
    g = random_graph(3000, 12, seed=2, wmax=500)
    res = solve(g, time_limit=2.0, device_assist=True, assist_batch=32)
    assert is_vertex_cover(g, res.solution)
    assert cover_cost(g, res.solution) == res.cost
    assert res.assist_stats is not None
    # plain solve on the same budget must not be beaten by more than noise
    res0 = solve(g, time_limit=2.0)
    assert res.cost <= res0.cost * 1.01


def test_extract_regions_width20():
    """rmax > 16 extracts (B, 20) instances whose exact solves patch back."""
    g = random_graph(600, 6, seed=9, wmax=80)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    centers = np.arange(0, 600, 31, dtype=np.uint32)
    ids, adj, wts, k = ls.extract_regions(centers, rmax=20)
    assert adj.shape[1] == 20 and wts.shape[1] == 20
    assert int(k.max()) > 16  # BFS actually grows past the old cap
    from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc
    bc, bs = pallas_small_mwvc(adj, wts, interpret=True)
    applied = 0
    for i in range(len(centers)):
        kk = int(k[i])
        if kk and ls.apply_region(kk, ids[i][:kk], int(bs[i])):
            applied += 1
    assert applied >= 1  # all-in cover around any center is improvable
    ls.commit_patches()
    cur = ls.current().astype(bool)
    ea = g.edge_array()
    assert (cur[ea[:, 0]] | cur[ea[:, 1]]).all()  # still a cover


def test_device_assist_worker_width20():
    """Worker round-trip at rmax=20 (CPU backend, interpret kernel)."""
    import time

    from gnn_mwvc_tpu.solver.device_assist import DeviceAssist

    g = random_graph(400, 6, seed=15, wmax=60)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    assist = DeviceAssist(np.full(g.n, 0.5, np.float32), device="cpu",
                          batch=16, rmax=20)
    try:
        deadline = time.time() + 240
        while assist.stats["batches"] == 0 and time.time() < deadline:
            assist.tick(ls)
            time.sleep(0.25)
        assert assist.stats["batches"] >= 1
        assert assist.stats["patches"] >= 1
        assert assist.stats["gain"] > 0
    finally:
        assist.stop()


def test_worker_outage_fallback_cpu_batches(monkeypatch):
    """While the device program load is in flight the worker must serve
    batches on the CPU enumeration kernel (round-4 outage policy: the
    r3c/r3d canonical outage runs recorded batches=0 for whole runs)."""
    import time

    from gnn_mwvc_tpu.solver.device_assist import DeviceAssist

    monkeypatch.setenv("GNN_MWVC_ASSIST_TEST_CPU", "1")
    monkeypatch.setenv("GNN_MWVC_ASSIST_FAKE_WARM", "6.0")
    g = random_graph(800, 8, seed=7, wmax=100)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    assist = DeviceAssist(np.full(g.n, 0.5, np.float32), device="tpu",
                          batch=32, rmax=14)
    try:
        deadline = time.time() + 180
        while assist.stats["batches_cpu"] == 0 and time.time() < deadline:
            assist.tick(ls)
            time.sleep(0.1)
        # pre-warm batches flowed on the CPU path
        assert assist.stats["batches_cpu"] >= 1
        assert assist.stats["patches"] >= 1
        # after the (fake) load lands, batches switch to the device path
        deadline = time.time() + 60
        while assist.stats["batches_device"] == 0 and time.time() < deadline:
            assist.tick(ls)
            time.sleep(0.1)
        assert assist.stats["batches_device"] >= 1
        assert assist.stats.get("t_worker_warm_s") == 6.0
        assert (assist.stats["batches"]
                == assist.stats["batches_cpu"]
                + assist.stats["batches_device"])
    finally:
        assist.stop()


def test_worker_width_race_routes_to_cpu(monkeypatch):
    """A width-16 job that races the 'warmed' notice (parent still
    extracting clamped while the worker is already hot at width 20) must
    run on the CPU enumeration kernel, NOT mint a fresh (B, 16) device
    program (ADVICE r4 #1).  Driven in-process against _worker_main with
    plain queues so the race is deterministic."""
    import queue as _q
    import threading
    import time

    monkeypatch.setenv("GNN_MWVC_ASSIST_TEST_CPU", "1")
    monkeypatch.setenv("GNN_MWVC_ASSIST_FAKE_WARM", "0.8")

    from gnn_mwvc_tpu.solver.device_assist import _worker_main

    jobs, results = _q.Queue(), _q.Queue()
    th = threading.Thread(
        target=_worker_main, args=(jobs, results, "tpu", 8, 20),
        daemon=True)
    th.start()

    def next_res(timeout=120):
        while True:
            msg = results.get(timeout=timeout)
            if msg[0] == "res":
                return msg
            if msg[0] == "err":
                raise AssertionError(msg[1])

    # pre-warm width-16 job: CPU path by definition
    jobs.put((1, np.zeros((8, 16), np.int32), np.zeros((8, 16), np.int32)))
    assert next_res()[5] == "cpu"
    time.sleep(1.2)  # fake warm (0.8 s) lands; worker is now hot
    # the RACE: a width-16 job arrives while the worker is hot at width 20
    # -> must still route to the CPU kernel (width != warmed shape)
    jobs.put((2, np.zeros((8, 16), np.int32), np.zeros((8, 16), np.int32)))
    assert next_res()[5] == "cpu"
    # a width-20 job takes the (fake-)device path at the warmed shape
    jobs.put((3, np.zeros((8, 20), np.int32), np.zeros((8, 20), np.int32)))
    assert next_res()[5] == "device"
    jobs.put(None)
    th.join(30)
    assert not th.is_alive()


def test_worker_rmax_clamped_when_accelerator_absent(monkeypatch):
    """rmax>16 with device='tpu' in a CPU-only environment must clamp to
    the width-16 enumeration path instead of interpret-mode pallas
    (ADVICE r3 #1)."""
    import time

    monkeypatch.setenv("GNN_MWVC_ASSIST_TEST_CPU", "1")

    from gnn_mwvc_tpu.solver.device_assist import DeviceAssist

    g = random_graph(600, 8, seed=11, wmax=100)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    assist = DeviceAssist(np.full(g.n, 0.5, np.float32), device="tpu",
                          batch=32, rmax=20)
    try:
        # the CPU helper can serve the first batch before the DEVICE
        # worker's "hello" arrives (round-5 dual-worker design), so wait
        # for both the batch and the hello before asserting the clamp
        deadline = time.time() + 180
        while ((assist.stats["batches"] == 0
                or "worker_platform" not in assist.stats)
               and time.time() < deadline):
            assist.tick(ls)
            time.sleep(0.1)
        assert assist.stats["batches"] >= 1
        assert assist.rmax == 16
        assert assist.stats.get("rmax_clamped") is True
        assert assist.stats["worker_platform"] == "cpu"
    finally:
        assist.stop()


def test_watchdog_abandons_stuck_device_batch(monkeypatch):
    """Post-warm relay collapse (round 5): a device batch stuck past
    device_batch_timeout_s is abandoned, new batches keep flowing through
    the dedicated CPU-helper process, and the eventual stale reply
    re-enables the device path (proof of life)."""
    import time

    from gnn_mwvc_tpu.solver.device_assist import DeviceAssist

    monkeypatch.setenv("GNN_MWVC_ASSIST_TEST_CPU", "1")
    monkeypatch.setenv("GNN_MWVC_ASSIST_FAKE_WARM", "0.5")
    monkeypatch.setenv("GNN_MWVC_ASSIST_FAKE_STALL", "6.0")
    g = random_graph(800, 8, seed=7, wmax=100)
    s0 = np.ones(g.n, np.uint8)
    ls = CoreLocalSearch(g.weights, g.edge_array(), s0)
    assist = DeviceAssist(np.full(g.n, 0.5, np.float32), device="tpu",
                          batch=32, rmax=14, device_batch_timeout_s=2.0)
    try:
        deadline = time.time() + 240
        while (assist.stats.get("batches_abandoned", 0) == 0
               and time.time() < deadline):
            assist.tick(ls)
            time.sleep(0.1)
        assert assist.stats["batches_abandoned"] >= 1
        assert not assist._worker_hot  # device disabled while stalled
        # the CPU helper keeps the assist flowing regardless
        deadline = time.time() + 120
        while assist.stats["batches_cpu"] == 0 and time.time() < deadline:
            assist.tick(ls)
            time.sleep(0.1)
        assert assist.stats["batches_cpu"] >= 1
        # the stale reply re-enables the device path
        deadline = time.time() + 120
        while (assist.stats.get("device_reenabled", 0) == 0
               and time.time() < deadline):
            assist.tick(ls)
            time.sleep(0.1)
        assert assist.stats["device_reenabled"] >= 1
    finally:
        assist.stop()
