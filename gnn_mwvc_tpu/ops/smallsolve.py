"""Batched exact MWVC by subset enumeration — the TPU-native analog of the
reference's SSE2 brute-force solver (reference: include/small_solve.hpp:44-76).

The reference vectorizes 4 candidate subsets per SSE register for ONE
instance; on TPU we enumerate all 2^16 subsets as a lane axis and batch
thousands of independent instances on the sublane axis, turning the exact
sub-solver into one dense int32 tensor op.  Used to batch the r4/r5 meta-rule
checks (many <= 8-vertex exact solves per reduction round).

Instances are padded to 16 nodes with adj = 0, w = 0; padding bits are free
and cost 0, so the minimum over the full 2^16 enumeration is exact for any
instance size <= 16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["batched_small_mwvc", "pack_instances"]

_INF = jnp.int32(2**31 - 1)  # int32 costs, same as the reference Small16


def pack_instances(instances):
    """instances: list of (weights list, edges list of (i, j) local pairs).

    Returns (adj (B,16) int32 bitmasks, w (B,16) int32).
    """
    b = len(instances)
    adj = np.zeros((b, 16), dtype=np.int32)
    w = np.zeros((b, 16), dtype=np.int32)
    for k, (wts, edges) in enumerate(instances):
        n = len(wts)
        assert n <= 16
        w[k, :n] = wts
        for i, j in edges:
            adj[k, i] |= 1 << j
            adj[k, j] |= 1 << i
    return adj, w


@jax.jit
def batched_small_mwvc(adj: jnp.ndarray, w: jnp.ndarray):
    """adj: (B, 16) int32 neighbor bitmasks; w: (B, 16) int32 weights.

    Returns (best_cost (B,) int32, best_set (B,) int32 subset bitmask with
    padding bits cleared).  Per-instance total weight must stay below 2^31
    (the reference's Small16 shares this int32 cost domain).
    """
    b = adj.shape[0]
    subsets = jax.lax.broadcasted_iota(jnp.int32, (1, 1 << 16), 1)  # (1, S)

    def body(j, carry):
        cost, valid = carry
        aj = adj[:, j].reshape(b, 1)
        wj = w[:, j].reshape(b, 1)
        chosen = (subsets >> j) & 1
        covered = (subsets & aj) == aj
        valid = valid & ((chosen == 1) | covered)
        cost = cost + jnp.where(chosen == 1, wj, 0)
        return cost, valid

    cost0 = jnp.zeros((b, 1 << 16), dtype=jnp.int32)
    valid0 = jnp.ones((b, 1 << 16), dtype=bool)
    cost, valid = jax.lax.fori_loop(0, 16, body, (cost0, valid0))
    cost = jnp.where(valid, cost, _INF)
    best_idx = jnp.argmin(cost, axis=1)
    best_cost = jnp.take_along_axis(cost, best_idx[:, None], axis=1)[:, 0]
    # clear padding bits (nodes with w == 0 and adj == 0 contribute nothing)
    used = ((w != 0) | (adj != 0))
    used_mask = jnp.sum(
        used.astype(jnp.int32) << jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1),
        axis=1,
    )
    return best_cost, best_idx.astype(jnp.int32) & used_mask
