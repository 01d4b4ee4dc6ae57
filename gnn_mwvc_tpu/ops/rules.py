"""Vectorized reduction-rule predicates over a padded graph snapshot.

The reference checks rules one vertex at a time through worklists
(reference: mwvc_reductions.hpp:335-380); on device we evaluate whole-graph
candidate masks in one fused pass — the "reduction rounds on device" half of
the BASELINE.json throughput target.  The host engine stays the source of
truth for exactness (it re-verifies candidates before applying), these masks
are prioritization/bulk-application hints:

* r1 (neighborhood reduction):   exact mask, NW(u) <= W(u).
* r2 (twin):                     candidate groups via neighborhood hashing —
  equal (degree, NW, hash) buckets; exact equality is re-checked host-side.
* r3 (domination) edge filter:   edges (u, v) passing the reference's cheap
  necessary conditions D(u) >= D(v), W(u)+NW(u) >= W(v)+NW(v), W(v) >= W(u).
* isolated-candidate filter:     vertices whose every neighbor passes the
  degree/weight precheck of is_dominating(v, u).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rule_masks", "twin_hash"]

_H1 = np.uint32(0x9E3779B9)
_H2 = np.uint32(0x85EBCA6B)


def _mix(x):
    x = (x ^ (x >> 16)) * _H2
    x = (x ^ (x >> 13)) * _H1
    return x ^ (x >> 16)


def twin_hash(row, col, n_pad):
    """Order-independent neighborhood hash per vertex: sum of mixed neighbor
    ids (uint32 wrap).  Twins (equal open neighborhoods) collide exactly."""
    h = _mix(col.astype(jnp.uint32) + _H1)
    return jax.ops.segment_sum(
        h, row, num_segments=n_pad, indices_are_sorted=True
    )


@jax.jit
def rule_masks(row, col, weights, degrees, nw, node_mask):
    """Returns dict of per-vertex masks / per-edge filters (all on device).

    row/col: padded directed COO (row sorted); weights/degrees/nw: (n_pad,).
    """
    n_pad = weights.shape[0]
    w = weights
    d = degrees
    r1 = node_mask & (nw <= w) & (d > 0)

    th = twin_hash(row, col, n_pad)
    # candidate twins: same (degree, nw, hash); padded rows excluded
    key = (
        th
        + _mix(d.astype(jnp.uint32) * _H2)
        + _mix(nw.astype(jnp.uint32) * _H1)
    )
    key = jnp.where(node_mask, key, jnp.uint32(0))

    # r3 edge filter: u dominates v possible (cheap necessary conditions)
    du, dv = d.take(row), d.take(col)
    wu, wv = w.take(row), w.take(col)
    nwu, nwv = nw.take(row), nw.take(col)
    dom_edge = (du >= dv) & (wu + nwu >= wv + nwv) & (wv >= wu)

    # isolated candidates: every neighbor v has D(v) >= D(u) and
    # W(v)+NW(v) >= W(u)+NW(u) (necessary for is_dominating(v, u))
    ok_nbr = (dv >= du) & (wv + nwv >= wu + nwu)
    bad = jax.ops.segment_sum(
        (~ok_nbr).astype(jnp.int32), row, num_segments=n_pad,
        indices_are_sorted=True,
    )
    iso_cand = node_mask & (d > 0) & (bad == 0)

    return {
        "r1": r1,
        "twin_key": key,
        "dom_edge": dom_edge,
        "iso_cand": iso_cand,
    }


def twin_groups(keys: np.ndarray, node_mask: np.ndarray):
    """Host post-processing: group vertex ids by equal twin key; returns list
    of candidate groups (size >= 2)."""
    keys = np.asarray(keys)
    ids = np.nonzero(np.asarray(node_mask))[0]
    k = keys[ids]
    order = np.argsort(k, kind="stable")
    ids, k = ids[order], k[order]
    groups = []
    start = 0
    for i in range(1, len(k) + 1):
        if i == len(k) or k[i] != k[start]:
            if i - start >= 2:
                groups.append(ids[start:i])
            start = i
    return groups
