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

    @property
    def parts(self) -> int:
        return self.row_loc.shape[0]


def partition_device_graph(dg: DeviceGraph, parts: int) -> ShardedGraph:
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
    return ShardedGraph(
        n=dg.n, n_loc=n_loc, e_loc=e_loc,
        row_loc=jnp.asarray(row_loc), col=jnp.asarray(col),
        weights=jnp.asarray(w), degrees=jnp.asarray(d), nw=jnp.asarray(nw),
        node_mask=jnp.asarray(mask),
    )


def _layer_stack(kinds, params, x, row_loc, col, deg, w, nw, ws, n_loc,
                 compat=True, precision=jax.lax.Precision.HIGHEST):
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
        else:  # graph layer: halo all-gather + local segment sum
            width = h.shape[1]
            h_full = jax.lax.all_gather(h, "graph", axis=0, tiled=True)
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
    """Build a jitted sharded scorer: (params, sg, ws) -> (P, n_loc) scores."""

    def local_fwd(params, row_loc, col, w, d, nw, ws):
        row_loc, col = row_loc[0], col[0]          # strip shard axis
        w, d, nw = w[0], d[0], nw[0]
        n_loc = w.shape[0]
        x = (w / ws).reshape(-1, 1)
        h = _layer_stack(kinds, params, x, row_loc, col, d, w, nw, ws, n_loc,
                         compat=compat, precision=precision)
        return h[:, 0][None]

    smap = jax.shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(),) + _SG_SPECS + (P(),),
        out_specs=P("graph", None),
        check_vma=False,
    )

    @jax.jit
    def fwd(params, row_loc, col, w, d, nw, ws):
        return smap(params, row_loc, col, w, d, nw, jnp.float32(ws))

    def scorer(params, sg: ShardedGraph, ws):
        return fwd(params, sg.row_loc, sg.col, sg.weights, sg.degrees,
                   sg.nw, ws)

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
