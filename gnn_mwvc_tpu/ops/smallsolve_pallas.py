"""Pallas meet-in-the-middle exact MWVC kernel (batched, <=16 or <=20 nodes).

The jnp enumeration kernel (ops/smallsolve.py) carries (B, 65536) cost and
validity arrays through a 16-step ``fori_loop`` — every step round-trips
~335 MB of carry through HBM, ~17 GB per B=1024 batch, which matches the
measured ~21 ms/batch on v5e: the subset enumeration is HBM-bound on carry
traffic, not compute-bound.  This kernel keeps the whole evaluation in
VMEM and restructures it so almost no per-subset work remains:

* MWVC by complement: a subset ``s`` is a vertex cover iff its complement
  ``c`` is an independent set, and cost(s) = total_w - w(c).  Enumerate
  complements split as c = c_high (n-7 bits) | c_low (7 bits).
* Host-free jnp precompute builds per-instance tables once per batch:
  indep/weight/cross-mask over the 128 low patterns and indep/weight over
  the 2^(n-7) high patterns (a few elementwise loops).
* The pallas grid walks (instance-block, high-block); per high pattern the
  128 low patterns evaluate in ONE lane vector: independent iff
  ``indep_low & indep_high & (crossmask_low[c_low] & c_high) == 0`` —
  about a dozen VPU ops per 128 subsets vs ~100 for direct enumeration,
  with zero HBM carry traffic.

The same structure makes n=20 regions (2^20 subsets — 16x the naive
enumeration cost, infeasible for the HBM-bound kernel) practical: the
per-subset cost is unchanged, only the high-table walk grows to 8192
patterns.

Tie-breaking matches ops/smallsolve.py exactly (smallest cover bitmask
among minima — what argmin-over-subset-order returns), so the n=16 variant
is drop-in interchangeable; tests assert bitwise-identical outputs.

This is the TPU analog of the reference's hand-vectorized SSE2 subset
enumeration (reference: include/small_solve.hpp:44-76 — the one routine
the reference itself drops to intrinsics for); used by the device-assist
region worker (solver/device_assist.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["pallas_small_mwvc"]

_INF = 2**31 - 1  # plain int: jnp constants may not be closure-captured by kernels
_N_LOW = 7        # low half: 128 lane patterns
_TB = 8           # instance sublane block (int32 min tile rows)


def _mitm_tables(adj, w, n):
    """Per-instance meet-in-the-middle tables, all jnp (fused under jit).

    adj, w: (B, n) int32; n = total bit width (16 or 20).  Returns (base,
    indep_low, cross_low, w_high, indep_high, used_mask):
      base       (B, 128)  total_w - w(c_low)  [cost before the high refund]
      indep_low  (B, 128)  1 if c_low is independent within the low 7
      cross_low  (B, 128)  OR of adj_high over the chosen low vertices
      w_high     (B, NH)   w(c_high)
      indep_high (B, NH)   1 if c_high is independent within the high bits
      used_mask  (B,)      bitmask of non-padding vertices
    """
    b = adj.shape[0]
    n_high = n - _N_LOW
    nh = 1 << n_high
    high_mask = nh - 1
    c_low = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    c_high = jax.lax.broadcasted_iota(jnp.int32, (1, nh), 1)
    total_w = jnp.sum(w, axis=1, dtype=jnp.int32)  # (B,)

    w_low = jnp.zeros((b, 128), jnp.int32)
    viol_low = jnp.zeros((b, 128), jnp.int32)
    cross_low = jnp.zeros((b, 128), jnp.int32)
    for j in range(_N_LOW):
        bit = (c_low >> j) & 1                      # (1, 128)
        aj = adj[:, j:j + 1]                        # (B, 1)
        w_low = w_low + bit * w[:, j:j + 1]
        viol_low = viol_low | (bit & ((aj & 0x7F & c_low) != 0))
        cross_low = cross_low | jnp.where(
            bit == 1, (aj >> _N_LOW) & high_mask, 0)

    w_high = jnp.zeros((b, nh), jnp.int32)
    viol_high = jnp.zeros((b, nh), jnp.int32)
    for j in range(n_high):
        bit = (c_high >> j) & 1
        aj = adj[:, _N_LOW + j:_N_LOW + j + 1]
        w_high = w_high + bit * w[:, _N_LOW + j:_N_LOW + j + 1]
        viol_high = viol_high | (
            bit & (((aj >> _N_LOW) & high_mask & c_high) != 0))

    base = total_w[:, None] - w_low
    used = ((w != 0) | (adj != 0)).astype(jnp.int32)
    used_mask = jnp.sum(used << jnp.arange(n, dtype=jnp.int32)[None, :],
                        axis=1)
    return (base, 1 - viol_low, cross_low, w_high, 1 - viol_high, used_mask)


def _kernel(base_ref, indep_lo_ref, cross_ref, wh_ref, ih_ref,
            cost_ref, idx_ref, *, full_mask):
    jstep = pl.program_id(1)

    @pl.when(jstep == 0)
    def _():
        cost_ref[:] = jnp.full(cost_ref.shape, _INF, jnp.int32)
        idx_ref[:] = jnp.full(idx_ref.shape, _INF, jnp.int32)

    base = base_ref[:]
    indep_lo = indep_lo_ref[:] != 0
    cross = cross_ref[:]
    # cover bitmask for c_high = 0: s = ~c_low over the used n-bit domain
    s_base = jnp.int32(full_mask) ^ jax.lax.broadcasted_iota(
        jnp.int32, (_TB, 128), 1)
    acc_c = cost_ref[:]
    acc_i = idx_ref[:]
    for k in range(128):
        ch = jstep * 128 + k                       # c_high value (scalar)
        wh = wh_ref[:, k:k + 1]                    # (TB, 1)
        ih = ih_ref[:, k:k + 1] != 0
        ok = indep_lo & ih & ((cross & ch) == 0)
        cost = jnp.where(ok, base - wh, _INF)
        s = s_base ^ (ch << _N_LOW)
        better = (cost < acc_c) | ((cost == acc_c) & (s < acc_i))
        acc_c = jnp.where(better, cost, acc_c)
        acc_i = jnp.where(better, s, acc_i)
    cost_ref[:] = acc_c
    idx_ref[:] = acc_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_small_mwvc(adj: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Batched exact MWVC over (B, n) bitmask instances, n = 16 or 20.

    adj: (B, n) int32 neighbor bitmasks (bit j of adj[i] = local edge to
    vertex j; a self-loop bit forces the vertex into the cover); w: (B, n)
    int32 weights, per-instance total weight < 2^30.  Returns (best_cost
    (B,) int32, best_set (B,) int32 with padding bits cleared).  For n=16
    this is bitwise-identical to ops.smallsolve.batched_small_mwvc
    including argmin tie-breaks (smallest cover bitmask among minima).
    """
    n = adj.shape[1]
    assert n in (16, 20), n
    nh = 1 << (n - _N_LOW)
    b0 = adj.shape[0]
    b = -(-b0 // _TB) * _TB
    if b != b0:
        adj = jnp.pad(adj, ((0, b - b0), (0, 0)))
        w = jnp.pad(w, ((0, b - b0), (0, 0)))
    base, indep_lo, cross_lo, w_high, indep_hi, used_mask = (
        _mitm_tables(adj, w, n))

    spec_row = pl.BlockSpec((_TB, 128), lambda i, j: (i, 0))
    spec_hi = pl.BlockSpec((_TB, 128), lambda i, j: (i, j))
    acc_c, acc_i = pl.pallas_call(
        functools.partial(_kernel, full_mask=(1 << n) - 1),
        grid=(b // _TB, nh // 128),
        in_specs=[spec_row, spec_row, spec_row, spec_hi, spec_hi],
        out_specs=[pl.BlockSpec((_TB, 128), lambda i, j: (i, 0)),
                   pl.BlockSpec((_TB, 128), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, 128), jnp.int32),
                   jax.ShapeDtypeStruct((b, 128), jnp.int32)],
        interpret=interpret,
    )(base, indep_lo, cross_lo, w_high, indep_hi)

    best_cost = jnp.min(acc_c, axis=1)
    cand = jnp.where(acc_c == best_cost[:, None], acc_i, _INF)
    best_idx = jnp.min(cand, axis=1) & used_mask
    return best_cost[:b0], best_idx[:b0]
