"""Edge-partitioned message passing over a device mesh (shard_map).

Design (SURVEY.md §2.4 / §5 "long-context" entry): nodes are partitioned into
P contiguous, equally padded ranges; every directed edge (dst-sorted COO) is
owned by the shard that owns its destination row.  A graph-layer round is then

    1. all-gather the (small, width <= 16) node feature block over the
       "graph" axis — the halo exchange; XLA lowers it to ICI ring steps,
    2. a purely local gather + sorted segment-sum over owned edges,
    3. local stat columns (D, W/ws, NW/ws are node-sharded).

Linear/activation layers are node-local, so one inference does exactly
3 all-gathers.  Autodiff through shard_map turns the all-gather into a
reduce-scatter in the backward pass, which is what a hand-written DP+graph
parallel backward would do anyway.

This mirrors the reference's only parallel loop (the per-node neighbor sum,
reference: src/gnn_inference.cpp:31-41) but scales graph *size* across chips
instead of threads.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "ShardedGraph",
    "partition_device_graph",
    "make_sharded_forward",
    "make_sharded_train_step",
]

from gnn_mwvc_tpu.graph import DeviceGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedGraph:
    """Per-shard stacked graph arrays; leading axis = graph-mesh axis (P)."""

    n: int = dataclasses.field(metadata=dict(static=True))       # real nodes
    n_loc: int = dataclasses.field(metadata=dict(static=True))   # padded nodes/shard
    e_loc: int = dataclasses.field(metadata=dict(static=True))   # padded edges/shard
    row_loc: jnp.ndarray = None   # (P, e_loc) int32 local dst row in [0, n_loc)
    col: jnp.ndarray = None       # (P, e_loc) int32 global src node
    weights: jnp.ndarray = None   # (P, n_loc) f32
    degrees: jnp.ndarray = None   # (P, n_loc) f32
    nw: jnp.ndarray = None        # (P, n_loc) f32
    node_mask: jnp.ndarray = None  # (P, n_loc) bool
    # optional stacked per-shard windowed-MXU plans (see ops/blocked.py):
    # tuples of (P, C_s) / (P, C_s, S) arrays per chunk-size class
    blk_src_win: tuple = None
    blk_dst_win: tuple = None
    blk_lsrc: tuple = None
    blk_ldst: tuple = None
    blk_n_win: int = dataclasses.field(default=0, metadata=dict(static=True))
    blk_n_src_win: int = dataclasses.field(default=0,
                                           metadata=dict(static=True))

    @property
    def parts(self) -> int:
        return self.row_loc.shape[0]

    @property
    def has_blocked(self) -> bool:
        return self.blk_src_win is not None


def partition_device_graph(dg: DeviceGraph, parts: int,
                           aggregation: str = "scatter") -> ShardedGraph:
    """Split a DeviceGraph into *parts* contiguous node ranges.

    Edges go to the shard owning their destination; per-shard edge slots are
    padded to the max shard load.  Each shard's padded edge slots point at its
    local sink row (n_loc - 1), which is never a real node for the last shard
    (DeviceGraph reserves the global sink) and is masked out for others via
    row_loc targeting only slots the local node_mask covers.
    """
    n_loc = max(-(-dg.n_pad // parts), 8)
    shard = np.minimum(dg.row[: dg.e] // n_loc, parts - 1)
    counts = np.bincount(shard, minlength=parts)
    e_loc = int(max(128, -(-int(max(counts.max(), 1)) // 128) * 128))

    # Padded edge slots scatter into segment n_loc — one past the real rows;
    # the layer stack runs segment_sum with n_loc + 1 segments and drops it.
    row_loc = np.full((parts, e_loc), n_loc, dtype=np.int32)
    col = np.zeros((parts, e_loc), dtype=np.int32)
    w = np.zeros((parts, n_loc), dtype=np.float32)
    d = np.zeros((parts, n_loc), dtype=np.float32)
    nw = np.zeros((parts, n_loc), dtype=np.float32)
    mask = np.zeros((parts, n_loc), dtype=bool)

    order = np.argsort(shard, kind="stable")
    rows_sorted = dg.row[: dg.e][order]
    cols_sorted = dg.col[: dg.e][order]
    offsets = np.zeros(parts + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    for p in range(parts):
        lo, hi = offsets[p], offsets[p + 1]
        k = hi - lo
        row_loc[p, :k] = rows_sorted[lo:hi] - p * n_loc
        col[p, :k] = cols_sorted[lo:hi]
        nlo, nhi = p * n_loc, min((p + 1) * n_loc, dg.n_pad)
        cnt = max(nhi - nlo, 0)
        if cnt > 0:
            w[p, :cnt] = dg.weights[nlo:nhi]
            d[p, :cnt] = dg.degrees[nlo:nhi]
            nw[p, :cnt] = dg.nw[nlo:nhi]
            mask[p, :cnt] = dg.node_mask[nlo:nhi]
    blk = {}
    if aggregation == "blocked":
        # per-shard windowed plans over the all-gathered source space,
        # padded to common shapes so one shard_map program serves all shards
        from gnn_mwvc_tpu.ops.blocked import build_blocked

        n_src = parts * n_loc
        plans = []
        for p in range(parts):
            lo, hi = offsets[p], offsets[p + 1]
            rl = rows_sorted[lo:hi] - p * n_loc
            cl = cols_sorted[lo:hi]
            # local CSR (rows sorted within shard by construction)
            loc_indptr = np.zeros(n_loc + 1, dtype=np.int64)
            np.add.at(loc_indptr, rl + 1, 1)
            np.cumsum(loc_indptr, out=loc_indptr)
            plans.append(build_blocked(loc_indptr, cl, n_loc, n_src=n_src,
                                       as_numpy=True))
        ncls = len(plans[0].src_win)
        stk = {k: [] for k in ("sw", "dw", "ls", "ld")}
        for c in range(ncls):
            cmax = max(pl.src_win[c].shape[0] for pl in plans)
            size = plans[0].lsrc[c].shape[1]
            n_win = plans[0].n_win
            sw = np.zeros((parts, cmax), np.int32)
            dw = np.full((parts, cmax), n_win, np.int32)
            ls = np.zeros((parts, cmax, size), np.int32)
            ld = np.full((parts, cmax, size), 128, np.int32)
            for p, pl in enumerate(plans):
                cc = pl.src_win[c].shape[0]
                sw[p, :cc] = pl.src_win[c]
                dw[p, :cc] = pl.dst_win[c]
                ls[p, :cc] = pl.lsrc[c]
                ld[p, :cc] = pl.ldst[c]
            stk["sw"].append(jnp.asarray(sw))
            stk["dw"].append(jnp.asarray(dw))
            stk["ls"].append(jnp.asarray(ls))
            stk["ld"].append(jnp.asarray(ld))
        blk = dict(
            blk_src_win=tuple(stk["sw"]), blk_dst_win=tuple(stk["dw"]),
            blk_lsrc=tuple(stk["ls"]), blk_ldst=tuple(stk["ld"]),
            blk_n_win=plans[0].n_win, blk_n_src_win=plans[0].n_src_win,
        )
    return ShardedGraph(
        n=dg.n, n_loc=n_loc, e_loc=e_loc,
        row_loc=jnp.asarray(row_loc), col=jnp.asarray(col),
        weights=jnp.asarray(w), degrees=jnp.asarray(d), nw=jnp.asarray(nw),
        node_mask=jnp.asarray(mask), **blk,
    )


def _layer_stack(kinds, params, x, row_loc, col, deg, w, nw, ws, n_loc,
                 compat=True, precision=jax.lax.Precision.HIGHEST,
                 blocked_plan=None):
    """Shared layer walk; runs inside shard_map (axis name "graph")."""
    h = x
    for kind, p in zip(kinds, params):
        if kind == "linear":
            h = (
                jnp.dot(h, p["w"], preferred_element_type=jnp.float32,
                        precision=precision) + p["b"]
            ).astype(h.dtype)
        elif kind == "relu":
            h = jnp.maximum(h, 0)
        elif kind == "sigmoid":
            h = jax.nn.sigmoid(h)
        else:  # graph layer: halo all-gather + local aggregation
            width = h.shape[1]
            h_full = jax.lax.all_gather(h, "graph", axis=0, tiled=True)
            if blocked_plan is not None:
                from gnn_mwvc_tpu.ops.blocked import blocked_segment_sum

                agg = blocked_segment_sum(h_full, blocked_plan, n_out=n_loc)
            else:
                agg = jax.ops.segment_sum(
                    h_full.take(col, axis=0), row_loc,
                    num_segments=n_loc + 1, indices_are_sorted=True,
                )[:n_loc]
            stats = jnp.stack([deg, w / ws, nw / ws], axis=1).astype(h.dtype)
            if compat:
                out = jnp.concatenate(
                    [agg, h, jnp.zeros((n_loc, 3), h.dtype)], axis=1
                )
                h = jax.lax.dynamic_update_slice(out, stats, (0, width + 1))
            else:
                h = jnp.concatenate([agg, h, stats], axis=1)
    return h


_SG_SPECS = (
    P("graph", None),  # row_loc
    P("graph", None),  # col
    P("graph", None),  # weights
    P("graph", None),  # degrees
    P("graph", None),  # nw
)


def make_sharded_forward(kinds, mesh: Mesh, compat: bool = True,
                         precision=jax.lax.Precision.HIGHEST):
    """Build a jitted sharded scorer: (params, sg, ws) -> (P, n_loc) scores.

    When the ShardedGraph carries per-shard windowed plans (partition with
    aggregation="blocked"), each shard aggregates with MXU one-hot matmuls
    instead of a scatter.
    """
    cache = {}

    def get_fn(has_blocked, n_win, n_src_win, ncls):
        key = (has_blocked, n_win, n_src_win, ncls)
        if key in cache:
            return cache[key]

        def local_fwd(params, core, blk, ws):
            row_loc, col, w, d, nw = (a[0] for a in core)
            n_loc = w.shape[0]
            plan = None
            if has_blocked:
                from gnn_mwvc_tpu.ops.blocked import BlockedPlan

                plan = BlockedPlan(
                    n_pad=n_loc, n_win=n_win, n_src_win=n_src_win,
                    src_win=tuple(a[0] for a in blk[0]),
                    dst_win=tuple(a[0] for a in blk[1]),
                    lsrc=tuple(a[0] for a in blk[2]),
                    ldst=tuple(a[0] for a in blk[3]),
                )
            x = (w / ws).reshape(-1, 1)
            h = _layer_stack(kinds, params, x, row_loc, col, d, w, nw, ws,
                             n_loc, compat=compat, precision=precision,
                             blocked_plan=plan)
            return h[:, 0][None]

        if has_blocked:
            blk_spec = (
                tuple(P("graph", None) for _ in range(ncls)),
                tuple(P("graph", None) for _ in range(ncls)),
                tuple(P("graph", None, None) for _ in range(ncls)),
                tuple(P("graph", None, None) for _ in range(ncls)),
            )
        else:
            blk_spec = ()
        smap = jax.shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), (P("graph", None),) * 5, blk_spec, P()),
            out_specs=P("graph", None),
            check_vma=False,
        )
        fn = jax.jit(smap)
        cache[key] = fn
        return fn

    def scorer(params, sg: ShardedGraph, ws):
        core = (sg.row_loc, sg.col, sg.weights, sg.degrees, sg.nw)
        if sg.has_blocked:
            blk = (sg.blk_src_win, sg.blk_dst_win, sg.blk_lsrc, sg.blk_ldst)
            fn = get_fn(True, sg.blk_n_win, sg.blk_n_src_win,
                        len(sg.blk_src_win))
        else:
            blk = ()
            fn = get_fn(False, 0, 0, 0)
        return fn(params, core, blk, jnp.float32(ws))

    return scorer


def make_sharded_train_step(kinds, mesh: Mesh, lr=0.01, momentum=0.9,
                            compat: bool = True):
    """Full-batch MSE + SGD(momentum) training step over the sharded graph.

    Matches the reference training defaults (reference:
    old_files/src/apps/gnn_train.cpp:72-111, SGD lr 0.01 momentum 0.9); the
    backward pass is jax.grad through the sharded forward (the all-gather
    transposes to reduce-scatter automatically).
    """
    import optax

    tx = optax.sgd(learning_rate=lr, momentum=momentum)

    def loss_local(params, row_loc, col, w, d, nw, mask, y, ws):
        row_loc, col = row_loc[0], col[0]
        w, d, nw, mask, y = w[0], d[0], nw[0], mask[0], y[0]
        n_loc = w.shape[0]
        x = (w / ws).reshape(-1, 1)
        out = _layer_stack(kinds, params, x, row_loc, col, d, w, nw, ws,
                           n_loc, compat=compat)
        err = jnp.where(mask, out[:, 0] - y, 0.0)
        sse = jax.lax.psum(jnp.sum(err * err), "graph")
        cnt = jax.lax.psum(jnp.sum(mask.astype(jnp.float32)), "graph")
        return sse / jnp.maximum(cnt, 1.0)

    loss_sharded = jax.shard_map(
        loss_local,
        mesh=mesh,
        in_specs=(P(),) + _SG_SPECS + (P("graph", None), P("graph", None), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def step_fn(params, opt_state, row_loc, col, w, d, nw, mask, y, ws):
        loss, grads = jax.value_and_grad(
            lambda p: loss_sharded(p, row_loc, col, w, d, nw, mask, y,
                                   jnp.float32(ws))
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, sg: ShardedGraph, y, ws):
        return step_fn(params, opt_state, sg.row_loc, sg.col, sg.weights,
                       sg.degrees, sg.nw, sg.node_mask, y, ws)

    return step, tx
