"""Device-assisted phase 2: the TPU works the local-search budget too.

The reference keeps its single CPU busy for the whole 1000 s cutoff
(reference: src/GNN_VC.cpp:338-358 driving local_search.hpp:149-210); in
round 2 this framework's device went idle once peeling ended — typically
85-95 % of a canonical run.  This module closes SURVEY §2.4's host<->device
row in the device->search direction with two mechanisms:

1. **GNN-guided kicks** — the kernel is re-scored once on the (already
   warm) device at phase-2 start; the ILS kick then removes cover vertices
   sampled by *model misfit* (1 - p(u) for u in the cover) instead of
   uniformly, aiming diversification where the trained prior disagrees
   with the incumbent.  (pipeline.solve wires the bias into
   CoreLocalSearch.perturb_guided.)

2. **Device-batched exact region re-optimization** — between search
   batches the host extracts disjoint boundary-conditioned sub-instances
   (<=16 vertices by default, <=20 with assist_rmax>16) around misfit
   centers (core LocalSearch::extract_region: intra-region edges must be
   covered; a region vertex with an outside non-cover neighbor is forced
   in via a self-loop bit), a worker exact-solves thousands per call —
   the pallas meet-in-the-middle kernel on accelerators
   (ops/smallsolve_pallas.py), the 2^16 enumeration kernel on CPU
   (ops/smallsolve.py); both are device analogs of the reference's SSE2
   small_solve, include/small_solve.hpp:44-76 — and strictly-improving
   assignments are re-validated against the live cover and patched back
   (LocalSearch::apply_region + commit_patches).  The first device call
   pays the one-time program load through the relay — in the worker
   process, overlapped with the search, never blocking it.

All LS mutations happen in the caller's thread; the worker is a separate
*process* (spawn), so its one-time program compile through the relay can
never wedge or crash the solver process — shutdown is a clean terminate if
the compile is still in flight.  Job payloads are (B, 16) int32 arrays
(~128 KB) and results are two (B,) int32 arrays, trivial over a pipe.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import time

import numpy as np

__all__ = ["DeviceAssist"]


def _worker_main(jobs, results, device_kind):
    """Child process: exact-solve region batches on the requested backend."""
    import jax

    if device_kind == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from gnn_mwvc_tpu.ops.smallsolve import batched_small_mwvc
    from gnn_mwvc_tpu.solver.pipeline import pick_devices

    cpu, tpu = pick_devices()
    dev = tpu if (device_kind == "tpu" and tpu is not None) else cpu
    on_accel = dev is not None and dev.platform != "cpu"
    if on_accel:
        # accelerator: the pallas meet-in-the-middle kernel keeps the 2^n
        # evaluation in VMEM (~10x less device time per batch than the
        # HBM-bound enumeration carry; bitwise-identical results) and is
        # the only practical route to 20-vertex (2^20) regions.
        from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc

        def solve_batch(adj, w):
            return pallas_small_mwvc(adj, w)
    else:
        def solve_batch(adj, w):
            if adj.shape[1] == 16:
                return batched_small_mwvc(adj, w)
            # CPU backend with wide regions (tests only): interpret mode
            from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc
            return pallas_small_mwvc(adj, w, interpret=True)
    while True:
        job = jobs.get()
        if job is None:
            return
        adj, w = job
        try:
            t0 = time.perf_counter()
            if dev is not None:
                adj = jax.device_put(adj, dev)
                w = jax.device_put(w, dev)
            bc, bs = solve_batch(adj, w)
            results.put((np.asarray(bc), np.asarray(bs),
                         time.perf_counter() - t0))
        except Exception as exc:  # surfaced on the next tick
            results.put(("err", repr(exc)))


class DeviceAssist:
    def __init__(self, prob: np.ndarray, device=None, batch: int = 1024,
                 rmax: int = 14, seed: int = 1, misfit_frac: float = 0.75,
                 pool_mult: int = 16):
        """prob: model scores aligned with the LS vertex ids (kernel rows;
        0.5 = neutral).  batch: regions per device call (one program
        shape).  misfit_frac: fraction of centers sampled by misfit; the
        rest are uniform over the cover (coverage diversity).  pool_mult:
        centers are sampled pool_mult*batch at a time and consumed
        batch-by-batch — the O(n) misfit sampling per dispatch was measured
        at ~86 ms on a 721k-node kernel, which halved the host search's
        step rate when paid every batch (round-3 A/B)."""
        self.prob = np.asarray(prob, np.float32)
        self.batch = int(batch)
        self.rmax = int(rmax)
        self.pool_mult = int(pool_mult)
        self._pool = None
        self._pool_pos = 0
        self.misfit_frac = float(misfit_frac)
        self._rng = np.random.default_rng(seed)
        # device: None/"auto" = accelerator if present; "cpu" forces the
        # child onto the CPU backend (tests).  A jax.Device is mapped to
        # its platform kind (the child re-resolves it — devices don't
        # pickle across processes).
        if device in (None, "auto"):
            kind = "tpu"
        elif isinstance(device, str):
            kind = device
        else:
            kind = "cpu" if device.platform == "cpu" else "tpu"
        ctx = mp.get_context("spawn")
        self._jobs = ctx.Queue(maxsize=2)
        self._results = ctx.Queue()
        self._pending = None  # (ids (B,16), k (B,)) of the in-flight job
        self.stats = {"batches": 0, "regions": 0, "patches": 0,
                      "gain": 0, "t_device_s": 0.0, "t_host_s": 0.0,
                      "commits": 0}
        self._worker = ctx.Process(
            target=_worker_main, args=(self._jobs, self._results, kind),
            daemon=True, name="device-assist")
        self._worker.start()

    # -- caller thread -----------------------------------------------------
    def _refill_pool(self, ls):
        """One O(n) sampling pass yields pool_mult*batch centers; dispatches
        then just slice it.  Misfit drifts slowly (the model scores are
        static; only the cover moves), so a slightly stale pool is fine —
        apply_region re-validates against the live cover anyway."""
        cur = ls.current().astype(bool)
        n = len(cur)
        want = self.batch * self.pool_mult
        p = self.prob[:n] if len(self.prob) >= n else np.full(
            n, 0.5, np.float32)
        misfit = np.where(cur, 1.0 - p, 0.0).astype(np.float64)
        b_mis = int(want * self.misfit_frac)
        picks = []
        if misfit.sum() > 0 and b_mis > 0:
            # Gumbel top-k == sampling w/o replacement proportional to misfit
            g = self._rng.gumbel(size=n)
            key = np.where(misfit > 0, np.log(misfit + 1e-12) + g, -np.inf)
            k = min(b_mis, n - 1)
            picks.append(np.argpartition(-key, k)[:k])
        cover_ids = np.nonzero(cur)[0]
        b_uni = want - (len(picks[0]) if picks else 0)
        if len(cover_ids) and b_uni > 0:
            picks.append(self._rng.choice(
                cover_ids, size=min(b_uni, len(cover_ids)), replace=True))
        if not picks:
            self._pool = np.zeros(0, np.uint32)
        else:
            pool = np.concatenate(picks).astype(np.uint32)
            self._rng.shuffle(pool)
            self._pool = pool
        self._pool_pos = 0

    def _sample_centers(self, ls) -> np.ndarray:
        if self._pool is None or self._pool_pos + self.batch > len(self._pool):
            self._refill_pool(ls)
        if not len(self._pool):
            return self._pool
        c = self._pool[self._pool_pos: self._pool_pos + self.batch]
        self._pool_pos += self.batch
        return c

    def tick(self, ls) -> int:
        """Poll/advance the assist pipeline; returns patches applied now.

        Never blocks: if the device batch (or its one-time program load)
        is still in flight the caller goes straight back to searching.
        """
        t0 = time.perf_counter()
        applied = 0
        if self._pending is not None:
            try:
                res = self._results.get_nowait()
            except queue.Empty:
                self.stats["t_host_s"] += time.perf_counter() - t0
                return 0
            ids, ks = self._pending
            self._pending = None
            if len(res) == 2 and res[0] == "err":
                raise RuntimeError(f"device-assist worker failed: {res[1]}")
            bc, bs, t_dev = res
            self.stats["t_device_s"] += t_dev
            cost_before = ls.cost
            for i in range(len(ks)):
                k = int(ks[i])
                if k == 0:
                    continue
                if ls.apply_region(k, ids[i, :k], int(bs[i])):
                    applied += 1
            if applied:
                ls.commit_patches()
                self.stats["commits"] += 1
                self.stats["gain"] += cost_before - ls.cost
            self.stats["patches"] += applied
            self.stats["batches"] += 1

        # dispatch the next batch
        centers = self._sample_centers(ls)
        if len(centers):
            ids, adj, w, ks = ls.extract_regions(centers, rmax=self.rmax)
            if len(centers) < self.batch:  # keep one program shape
                pad = self.batch - len(centers)
                adj = np.pad(adj, ((0, pad), (0, 0)))
                w = np.pad(w, ((0, pad), (0, 0)))
                ids = np.pad(ids, ((0, pad), (0, 0)))
                ks = np.pad(ks, (0, pad))
            self.stats["regions"] += int((ks > 0).sum())
            self._pending = (ids, ks)
            self._jobs.put((adj, w))
        self.stats["t_host_s"] += time.perf_counter() - t0
        return applied

    def stop(self, timeout: float = 3.0):
        """Shutdown: ask the worker to drain; terminate it if its one-time
        program compile is still in flight (short runs) — a clean SIGTERM
        on a separate process, nothing to unwind in the solver."""
        try:
            self._jobs.put_nowait(None)
        except queue.Full:
            pass
        self._worker.join(timeout)
        if self._worker.is_alive():
            self._worker.terminate()
            self._worker.join(2.0)
        # never let unflushed queue buffers block interpreter exit
        for q in (self._jobs, self._results):
            try:
                q.cancel_join_thread()
                q.close()
            except Exception:
                pass
