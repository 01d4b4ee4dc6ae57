"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The acceptance bar from SURVEY.md §4(d): sharded (edge-partitioned) message
passing must match single-chip results to float tolerance.
"""

import numpy as np
import pytest

import jax

from gnn_mwvc_tpu.graph import DeviceGraph
from gnn_mwvc_tpu.models import load_pretrained
from gnn_mwvc_tpu.models.gnn import score_graph
from gnn_mwvc_tpu.parallel import (
    make_mesh,
    partition_device_graph,
    make_sharded_forward,
    make_sharded_train_step,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_forward_matches_single(mesh8, rnd_graph):
    g = rnd_graph(700, 10, seed=21)
    dg = DeviceGraph.from_graph(g)
    m = load_pretrained()
    ws = float(g.weights.max())

    single = np.asarray(score_graph(m, dg, ws))[: g.n]

    sg = partition_device_graph(dg, 8)
    fwd = make_sharded_forward(m.kinds, mesh8)
    out = np.asarray(fwd(m.params, sg, ws)).reshape(-1)
    mask = np.asarray(sg.node_mask).reshape(-1)
    sharded = out[mask][: g.n]
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_partition_covers_all_edges(rnd_graph):
    g = rnd_graph(300, 6, seed=1)
    dg = DeviceGraph.from_graph(g)
    sg = partition_device_graph(dg, 4, halo=False)
    # total real edges recoverable: count slots whose (shard, row) is a real node
    rows = np.asarray(sg.row_loc)
    cols = np.asarray(sg.col)
    node_mask = np.asarray(dg.node_mask)
    total = 0
    for p in range(4):
        live = rows[p] < sg.n_loc  # padding slots target segment n_loc
        dst_real = np.zeros_like(live)
        dst_real[live] = np.asarray(sg.node_mask[p])[rows[p][live]]
        total += int((live & dst_real & node_mask[cols[p]]).sum())
    assert total == dg.e


def test_halo_partition_covers_all_edges(rnd_graph):
    g = rnd_graph(300, 6, seed=1)
    dg = DeviceGraph.from_graph(g)
    sg = partition_device_graph(dg, 4)
    assert sg.halo
    total = 0
    for p in range(4):
        for rows in (np.asarray(sg.row_int[p]), np.asarray(sg.row_bnd[p])):
            live = rows < sg.n_loc
            total += int(np.asarray(sg.node_mask[p])[rows[live]].sum())
    assert total == dg.e


def test_halo_fullgather_parity(mesh8, rnd_graph):
    """halo=True and halo=False produce identical scores."""
    g = rnd_graph(500, 8, seed=5)
    dg = DeviceGraph.from_graph(g)
    m = load_pretrained()
    ws = float(g.weights.max())
    fwd = make_sharded_forward(m.kinds, mesh8)
    outs = []
    for halo in (True, False):
        sg = partition_device_graph(dg, 8, halo=halo)
        assert sg.halo == halo
        out = np.asarray(fwd(m.params, sg, ws)).reshape(-1)
        outs.append(out[np.asarray(sg.node_mask).reshape(-1)][: g.n])
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_halo_bytes_proportional_to_boundary():
    """Communicated bytes ride the boundary size, not total nodes.

    A 2-D grid's boundary between contiguous node ranges is O(side), so the
    halo exchange must move far less than the full feature block (VERDICT
    round-1 item 2 acceptance)."""
    import bench

    side = 120
    g = bench.build_road_graph(side, extra=0.0)  # pure grid: tiny boundary
    dg = DeviceGraph.from_graph(g)
    sg = partition_device_graph(dg, 8)
    full = partition_device_graph(dg, 8, halo=False)
    assert sg.halo_bytes_per_chip() < full.halo_bytes_per_chip() / 10
    # the halo buffer is proportional to the cut (~2 grid rows per peer
    # pair), NOT to n_loc: doubling the graph depth would double full-gather
    # bytes but leave h_max unchanged
    assert sg.h_max <= 2 * side + 8
    g2 = bench.build_road_graph(side, extra=0.0)
    # same cut, deeper shards: emulate by partitioning into fewer parts
    sg4 = partition_device_graph(DeviceGraph.from_graph(g2), 4)
    assert abs(int(sg4.h_max) - int(sg.h_max)) <= 16


def test_sharded_blocked_halo_matches_single(mesh8, rnd_graph):
    """Windowed MXU aggregation over the [local|halo] source space."""
    from tests.test_blocked import geo_graph

    g = geo_graph(40, 3)
    dg = DeviceGraph.from_graph(g)
    m = load_pretrained()
    ws = float(g.weights.max())
    single = np.asarray(score_graph(m, dg, ws))[: g.n]
    sg = partition_device_graph(dg, 8, aggregation="blocked", halo=True)
    assert sg.has_blocked and sg.halo
    fwd = make_sharded_forward(m.kinds, mesh8)
    out = np.asarray(fwd(m.params, sg, ws)).reshape(-1)
    sharded = out[np.asarray(sg.node_mask).reshape(-1)][: g.n]
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_train_step_runs(mesh8, rnd_graph):
    g = rnd_graph(256, 6, seed=13)
    dg = DeviceGraph.from_graph(g)
    m = load_pretrained()
    ws = float(g.weights.max())
    sg = partition_device_graph(dg, 8)
    step, tx = make_sharded_train_step(m.kinds, mesh8)
    import optax

    opt_state = tx.init(m.params)
    y = np.zeros((8, sg.n_loc), np.float32)
    y[np.asarray(sg.node_mask)] = 1.0
    params, opt_state, loss = step(m.params, opt_state, sg, y, ws)
    assert np.isfinite(float(loss))
    params2, _, loss2 = step(params, opt_state, sg, y, ws)
    assert float(loss2) < float(loss)  # one SGD step reduces full-batch loss


def test_sharded_blocked_matches_single(mesh8, rnd_graph):
    """Per-shard windowed MXU aggregation == single-chip scores."""
    from tests.test_blocked import geo_graph

    g = geo_graph(40, 3)
    dg = DeviceGraph.from_graph(g)
    m = load_pretrained()
    ws = float(g.weights.max())
    single = np.asarray(score_graph(m, dg, ws))[: g.n]

    sg = partition_device_graph(dg, 8, aggregation="blocked", halo=False)
    assert sg.has_blocked
    fwd = make_sharded_forward(m.kinds, mesh8)
    out = np.asarray(fwd(m.params, sg, ws)).reshape(-1)
    mask = np.asarray(sg.node_mask).reshape(-1)
    sharded = out[mask][: g.n]
    np.testing.assert_allclose(sharded, single, atol=1e-5)
