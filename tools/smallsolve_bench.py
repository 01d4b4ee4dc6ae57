"""TPU micro-bench: jnp enumeration vs pallas meet-in-the-middle small-solve.

Relay rules (CLAUDE.md): chain each iteration's input on the previous
output (the relay elides repeated identical executions) and measure in
short bursts, best-of-batches (sustained streams are rate-limited).

Usage:
    python tools/smallsolve_bench.py [--batch 1024] [--bursts 4] [--per 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_fn(fn, adj, w, bursts, per):
    import jax

    bc, bs = fn(adj, w)   # compile + one-time program load
    jax.block_until_ready((bc, bs))
    best = None
    used = w > 0  # keep padding vertices at w=0 across perturbations
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(per):
            # chain: perturb weights with the previous output (used
            # vertices only — the instance population stays the stated
            # generator's)
            w = np.where(
                used, (w + (np.asarray(bs)[:, None] & 7)) % 997 + 1, 0
            ).astype(np.int32)
            bc, bs = fn(adj, w)
        jax.block_until_ready((bc, bs))
        dt = (time.perf_counter() - t0) / per
        best = dt if best is None else min(best, dt)
        time.sleep(1.0)
    return best


def random_batch(rng, b, n):
    adj = np.zeros((b, n), np.int32)
    w = np.zeros((b, n), np.int32)
    for k in range(b):
        m = int(rng.integers(n // 2, n + 1))
        w[k, :m] = rng.integers(1, 1000, size=m)
        for _ in range(2 * m):
            i, j = rng.integers(0, m, size=2)
            if i != j:
                adj[k, i] |= 1 << j
                adj[k, j] |= 1 << i
    return adj, w


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--bursts", type=int, default=4)
    ap.add_argument("--per", type=int, default=5)
    ap.add_argument("--out", default="/tmp/smallsolve_bench.json")
    args = ap.parse_args(argv)

    import jax

    from gnn_mwvc_tpu.ops.smallsolve import batched_small_mwvc
    from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc

    dev = jax.devices()[0]
    rng = np.random.default_rng(3)
    rows = {}

    adj16, w16 = random_batch(rng, args.batch, 16)
    # parity on the real device first (interpret-mode tests run on CPU)
    c0, s0 = batched_small_mwvc(adj16, w16)
    c1, s1 = pallas_small_mwvc(adj16, w16)
    assert np.array_equal(np.asarray(c0), np.asarray(c1)), "cost mismatch"
    assert np.array_equal(np.asarray(s0), np.asarray(s1)), "set mismatch"
    rows["parity_n16"] = "bitwise-identical on device"

    t_enum = bench_fn(batched_small_mwvc, adj16, w16, args.bursts, args.per)
    t_pal16 = bench_fn(pallas_small_mwvc, adj16, w16, args.bursts, args.per)
    rows["enum_n16_ms"] = round(t_enum * 1e3, 2)
    rows["pallas_n16_ms"] = round(t_pal16 * 1e3, 2)
    rows["speedup_n16"] = round(t_enum / t_pal16, 1)
    rows["enum_regions_per_s"] = round(args.batch / t_enum)
    rows["pallas16_regions_per_s"] = round(args.batch / t_pal16)

    adj20, w20 = random_batch(rng, args.batch, 20)
    t_pal20 = bench_fn(pallas_small_mwvc, adj20, w20, args.bursts, args.per)
    rows["pallas_n20_ms"] = round(t_pal20 * 1e3, 2)
    rows["pallas20_regions_per_s"] = round(args.batch / t_pal20)

    rows["device"] = str(dev)
    rows["batch"] = args.batch
    print(json.dumps(rows))
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
