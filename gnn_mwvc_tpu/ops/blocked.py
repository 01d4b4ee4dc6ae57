"""Windowed block-sparse aggregation on the MXU.

Why: v5e random-row gathers are latency-bound (~7 ns/row regardless of
locality or dtype — measured), so per-edge gathers cap aggregation at
~150M edges/s.  Real MWVC instances (road networks, web graphs) have strong
locality after a BFS/Cuthill-McKee reorder; this op exploits it:

* nodes are split into windows of 128; every edge lives in a (dst-window,
  src-window) pair; edges are grouped per pair and padded into chunks of 128;
* per chunk, aggregation is two one-hot matmuls on the MXU:
      gathered = onehot(lsrc) @ x_window        (the "gather")
      partial  = onehot(ldst)^T @ gathered      (the "scatter")
  with the one-hots built by iota comparison — no memory gathers at all
  except one *large-granule* (128 x W) window gather, which is
  bandwidth-bound, not latency-bound;
* per-window partials combine with a segment-sum over chunk destination
  windows (again large-granule).

Efficiency = edges / (128 * chunks): high when the reordered graph keeps
neighbors within a few windows.  `plan_quality` reports it so callers can
fall back to the ELL gather path for locality-free graphs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockedPlan", "build_blocked", "blocked_segment_sum"]

WIN = 128        # node window (MXU tile edge)
CHUNK = 128      # edges per chunk (MXU depth)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockedPlan:
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    n_win: int = dataclasses.field(metadata=dict(static=True))
    n_chunks: int = dataclasses.field(metadata=dict(static=True))
    src_win: jnp.ndarray = None   # (C,) int32 source window per chunk
    dst_win: jnp.ndarray = None   # (C,) int32 dst window per chunk (sorted)
    lsrc: jnp.ndarray = None      # (C, CHUNK) int32 local src in [0, WIN)
    ldst: jnp.ndarray = None      # (C, CHUNK) int32 local dst, padding -> WIN
    quality: float = dataclasses.field(default=0.0, metadata=dict(static=True))


def build_blocked(indptr: np.ndarray, indices: np.ndarray,
                  n_pad: int) -> BlockedPlan:
    """Host prep for one CSR snapshot (rows = destinations)."""
    n = len(indptr) - 1
    e = len(indices)
    deg = np.diff(indptr).astype(np.int64)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    src = np.asarray(indices, dtype=np.int64)

    n_win = -(-n_pad // WIN)
    dw = dst // WIN
    sw = src // WIN
    pair = dw * n_win + sw
    order = np.argsort(pair, kind="stable")
    pair_s = pair[order]
    dst_s = dst[order]
    src_s = src[order]

    # chunk boundaries: new chunk when pair changes or CHUNK edges consumed
    if e:
        new_pair = np.empty(e, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = pair_s[1:] != pair_s[:-1]
        # index within pair run
        run_id = np.cumsum(new_pair) - 1
        run_start = np.zeros(e, dtype=np.int64)
        run_start[new_pair] = np.arange(e)[new_pair]
        run_start = np.maximum.accumulate(run_start)
        within = np.arange(e) - run_start
        chunk_of_edge = run_id * 0  # placeholder
        # global chunk id: offset chunks per run
        chunks_per_run = np.zeros(int(run_id[-1]) + 1, dtype=np.int64)
        np.maximum.at(chunks_per_run, run_id, within // CHUNK + 1)
        chunk_base = np.zeros(len(chunks_per_run) + 1, dtype=np.int64)
        np.cumsum(chunks_per_run, out=chunk_base[1:])
        chunk_of_edge = chunk_base[run_id] + within // CHUNK
        n_chunks = int(chunk_base[-1])
        slot = within % CHUNK
    else:
        n_chunks = 0

    n_chunks_pad = max(8, -(-max(n_chunks, 1) // 8) * 8)
    src_win = np.zeros(n_chunks_pad, dtype=np.int32)
    # padding chunks target the dropped segment n_win, keeping dst_win sorted
    dst_win = np.full(n_chunks_pad, n_win, dtype=np.int32)
    lsrc = np.zeros((n_chunks_pad, CHUNK), dtype=np.int32)
    ldst = np.full((n_chunks_pad, CHUNK), WIN, dtype=np.int32)  # pad -> WIN

    if e:
        src_win[chunk_of_edge] = (src_s // WIN).astype(np.int32)
        dst_win[chunk_of_edge] = (dst_s // WIN).astype(np.int32)
        lsrc[chunk_of_edge, slot] = (src_s % WIN).astype(np.int32)
        ldst[chunk_of_edge, slot] = (dst_s % WIN).astype(np.int32)

    quality = float(e) / float(max(n_chunks, 1) * CHUNK) if e else 1.0
    return BlockedPlan(
        n_pad=n_pad, n_win=n_win, n_chunks=n_chunks_pad,
        src_win=jnp.asarray(src_win), dst_win=jnp.asarray(dst_win),
        lsrc=jnp.asarray(lsrc), ldst=jnp.asarray(ldst),
        quality=quality,
    )


def blocked_segment_sum(x: jnp.ndarray, plan: BlockedPlan,
                        chunk_batch: int = 4096) -> jnp.ndarray:
    """agg[u] = sum over v in N(u) of x[v], via windowed MXU matmuls."""
    w = x.shape[1]
    n_win = plan.n_win
    pad_rows = n_win * WIN - x.shape[0]
    xw = jnp.pad(x, ((0, pad_rows), (0, 0))).reshape(n_win, WIN, w)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)

    def do_batch(args):
        src_win, dst_win, lsrc, ldst = args
        xs = xw.take(src_win, axis=0)                     # (B, WIN, w)
        oh_src = (lsrc[:, :, None] == iota).astype(x.dtype)   # (B, C, WIN)
        gathered = jnp.einsum(
            "bcw,bwf->bcf", oh_src, xs,
            preferred_element_type=jnp.float32,
        )                                                  # (B, CHUNK, w)
        oh_dst = (ldst[:, :, None] == iota).astype(x.dtype)   # (B, C, WIN)
        partial = jnp.einsum(
            "bcd,bcf->bdf", oh_dst, gathered,
            preferred_element_type=jnp.float32,
        )                                                  # (B, WIN, w)
        return partial.astype(x.dtype)

    c = plan.src_win.shape[0]
    if c <= chunk_batch:
        partial = do_batch((plan.src_win, plan.dst_win, plan.lsrc, plan.ldst))
        dstw = plan.dst_win
    else:
        nb = -(-c // chunk_batch)
        pad = nb * chunk_batch - c
        sw = jnp.pad(plan.src_win, (0, pad))
        dw = jnp.pad(plan.dst_win, (0, pad), constant_values=n_win)
        ls = jnp.pad(plan.lsrc, ((0, pad), (0, 0)))
        ld = jnp.pad(plan.ldst, ((0, pad), (0, 0)), constant_values=WIN)
        partial = jax.lax.map(
            do_batch,
            (sw.reshape(nb, chunk_batch),
             dw.reshape(nb, chunk_batch),
             ls.reshape(nb, chunk_batch, CHUNK),
             ld.reshape(nb, chunk_batch, CHUNK)),
        ).reshape(nb * chunk_batch, WIN, x.shape[1])
        dstw = dw

    # combine chunk partials into destination windows (large-granule scatter)
    agg_w = jax.ops.segment_sum(
        partial, dstw, num_segments=n_win + 1, indices_are_sorted=True
    )[:n_win]
    return agg_w.reshape(n_win * WIN, -1)[: x.shape[0]]
