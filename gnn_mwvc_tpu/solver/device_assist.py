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
import os
import queue
import time

import numpy as np

__all__ = ["DeviceAssist"]


def _worker_main(jobs, results, device_kind, batch, width, role="device"):
    """Child process: exact-solve region batches on the requested backend.

    Outage policy (round 4 — VERDICT r3 weak #2): the FIRST device call of
    this process pays the one-time program compile/load through the
    remote-compile relay (6-314 s healthy, unbounded in an outage — the
    r3c/r3d canonical runs recorded ``batches: 0`` for entire 700-1000 s
    runs because this load never arrived).  The worker therefore warms the
    device program on a synthetic (batch, width) dummy in a BACKGROUND
    THREAD starting at process startup, and serves every job that arrives
    before the warm completes with the CPU enumeration kernel
    (ops/smallsolve.py on the host backend) — the assist never idles while
    the relay wedges, mirroring the reference CPU which never idles its
    only compute resource (reference: src/GNN_VC.cpp:338-358).  Once the
    warm lands, jobs switch to the pallas device kernel; a failed warm
    pins the worker on the CPU path.

    Control-message protocol on ``results`` (tag-first tuples):
      ("hello", platform)  — resolved backend, sent once at startup; lets
                             the parent clamp rmax when an accelerator was
                             requested but absent (ADVICE r3 #1).
      ("warmed", seconds)  — device program live (0.0 on the CPU backend).
      ("res", bc, bs, t, path) — a solved batch; path in {"device", "cpu"}.
      ("err", repr)        — surfaced by the parent on its next tick.
    """
    import threading

    import jax

    # GNN_MWVC_ASSIST_TEST_CPU: tests force the spawned child onto the CPU
    # backend — the parent process's jax.config CPU forcing (conftest) does
    # not cross the process boundary, and a bare spawn would otherwise
    # initialize the real accelerator.
    # role="cpu": the dedicated CPU-helper process (round 5).  The round-4
    # in-process CPU fallback starved in production when the device warm
    # wedged inside a GIL/compile-lock-holding relay call (r5 rmax A/B:
    # 300 s with one dispatched batch and batches_cpu == 0) — a separate
    # process that NEVER touches the accelerator cannot be starved by it.
    if (role == "cpu" or device_kind == "cpu"
            or os.environ.get("GNN_MWVC_ASSIST_TEST_CPU")):
        jax.config.update("jax_platforms", "cpu")

    from gnn_mwvc_tpu.ops.smallsolve import batched_small_mwvc
    from gnn_mwvc_tpu.solver.pipeline import pick_devices

    cpu, tpu = pick_devices()
    dev = (tpu if (role == "device" and device_kind == "tpu"
                   and tpu is not None) else cpu)
    on_accel = dev is not None and dev.platform != "cpu"
    # test hooks: simulate a slow one-time device program load / a
    # post-warm per-batch stall (relay execution collapse) in CI
    fake_warm_s = float(os.environ.get("GNN_MWVC_ASSIST_FAKE_WARM", "0"))
    fake_stall_s = float(os.environ.get("GNN_MWVC_ASSIST_FAKE_STALL", "0"))
    if role == "device":
        results.put(("hello", dev.platform if dev is not None else "cpu"))

    def cpu_solve(adj, w):
        if adj.shape[1] == 16:
            if cpu is not None:
                adj = jax.device_put(adj, cpu)
                w = jax.device_put(w, cpu)
            return batched_small_mwvc(adj, w)
        # width-20 on the host backend (tests / explicit device="cpu"):
        # interpret-mode pallas — never used as the outage fallback (the
        # parent clamps pre-warm extraction to rmax 16).
        from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc
        return pallas_small_mwvc(adj, w, interpret=True)

    warm = {"state": "hot"}  # CPU backend needs no warm
    if role == "cpu":
        device_solve = cpu_solve  # helper: pure CPU, no warm protocol
    elif fake_warm_s > 0 and not on_accel:
        warm["state"] = "loading"

        def _fake_warm():
            time.sleep(fake_warm_s)
            warm["state"] = "hot"
            results.put(("warmed", fake_warm_s))

        threading.Thread(target=_fake_warm, daemon=True,
                         name="assist-warm").start()
        on_accel = True  # post-warm jobs report path="device"
        device_solve = cpu_solve
    elif on_accel:
        # pallas meet-in-the-middle kernel: 2^n evaluation stays in VMEM
        # (~10x less device time per batch than the HBM-bound enumeration
        # carry; bitwise-identical results) and the only practical route
        # to 20-vertex (2^20) regions.
        from gnn_mwvc_tpu.ops.smallsolve_pallas import pallas_small_mwvc

        warm["state"] = "loading"

        def _warm_run():
            t0 = time.perf_counter()
            try:
                dummy_adj = jax.device_put(
                    np.zeros((batch, width), np.int32), dev)
                dummy_w = jax.device_put(
                    np.zeros((batch, width), np.int32), dev)
                jax.block_until_ready(pallas_small_mwvc(dummy_adj, dummy_w))
                warm["state"] = "hot"
                results.put(("warmed", time.perf_counter() - t0))
            except Exception as exc:
                # not fatal: the worker keeps serving on the CPU path
                warm["state"] = "failed"
                results.put(("warmfail", repr(exc)))

        threading.Thread(target=_warm_run, daemon=True,
                         name="assist-warm").start()

        def device_solve(adj, w):
            adj = jax.device_put(adj, dev)
            w = jax.device_put(w, dev)
            return pallas_small_mwvc(adj, w)
    else:
        results.put(("warmed", 0.0))
        device_solve = cpu_solve

    while True:
        job = jobs.get()
        if job is None:
            return
        seq, adj, w = job
        try:
            t0 = time.perf_counter()
            # the device path is only valid at the warmed (batch, width)
            # shape: a job at any other width would mint a fresh device
            # program mid-run (one-time relay load, 6-314 s healthy) — a
            # width-16 job racing the "warmed" notice goes to the CPU
            # enumeration kernel instead.
            use_device = (warm["state"] == "hot" and on_accel
                          and adj.shape[1] == width)
            if not use_device and adj.shape[1] > 16 and on_accel:
                # width-20 pre-warm job (parent raced the "warmed" notice,
                # or an explicit wide dispatch): the device kernel is the
                # only sane path — wait for the warm instead of burning
                # the host CPUs on interpret mode.
                while warm["state"] == "loading":
                    time.sleep(0.1)
                use_device = (warm["state"] == "hot"
                              and adj.shape[1] == width)
            if use_device and fake_stall_s > 0:
                time.sleep(fake_stall_s)  # test hook: relay exec collapse
            if use_device:
                bc, bs = device_solve(adj, w)
                path = "device"
            else:
                bc, bs = cpu_solve(adj, w)
                path = "cpu"
            results.put(("res", seq, np.asarray(bc), np.asarray(bs),
                         time.perf_counter() - t0, path))
        except Exception as exc:  # surfaced on the next tick
            results.put(("err", repr(exc)))


class DeviceAssist:
    def __init__(self, prob: np.ndarray, device=None, batch: int = 1024,
                 rmax: int = 20, seed: int = 1, misfit_frac: float = 0.75,
                 pool_mult: int = 16, device_batch_timeout_s: float = 30.0):
        """prob: model scores aligned with the LS vertex ids (kernel rows;
        0.5 = neutral).  batch: regions per device call (one program
        shape).  misfit_frac: fraction of centers sampled by misfit; the
        rest are uniform over the cover (coverage diversity).  pool_mult:
        centers are sampled pool_mult*batch at a time and consumed
        batch-by-batch — the O(n) misfit sampling per dispatch was measured
        at ~86 ms on a 721k-node kernel, which halved the host search's
        step rate when paid every batch (round-3 A/B).

        rmax default 20 (round 5): the pallas 2^20 meet-in-the-middle
        kernel won both clean equal-budget pairings vs rmax 14 on road900
        kernels (-13,365 r5, -10,639 r3c; the only other r5 pairing had a
        wedged-warm arm and is not comparable).

        device_batch_timeout_s: post-warm watchdog — a device batch stuck
        past this (relay execution collapse) is abandoned, new batches
        route to the dedicated CPU-helper process, and the first late
        reply from the device worker re-enables it."""
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
        self._kind = kind
        ctx = mp.get_context("spawn")
        self._jobs = ctx.Queue(maxsize=2)
        self._results = ctx.Queue()
        self._pending = None  # {"ids", "ks", "seq", "t0", "watch"}
        self._seq = 0
        self._stale = set()  # abandoned device seqs (watchdog)
        self.device_batch_timeout_s = float(device_batch_timeout_s)
        self.stats = {"batches": 0, "regions": 0, "patches": 0,
                      "gain": 0, "t_device_s": 0.0, "t_host_s": 0.0,
                      "commits": 0, "batches_cpu": 0, "batches_device": 0}
        # Until the worker's device program is live, width-20 extraction is
        # clamped to 16 so the CPU helper (enumeration kernel) can serve
        # the batches; the worker's "warmed" notice lifts the clamp without
        # minting a second device shape (the warm dummy already used the
        # production (batch, width) shape).
        self._worker_hot = kind == "cpu"
        width = 16 if self.rmax <= 16 else 20
        self._width = width
        self._worker = ctx.Process(
            target=_worker_main,
            args=(self._jobs, self._results, kind, self.batch, width),
            daemon=True, name="device-assist")
        self._worker.start()
        # Dedicated CPU-helper process (round 5): serves every batch the
        # device worker can't take — pre-warm, width-clamped, or
        # watchdog-disabled.  A separate process that never touches the
        # accelerator cannot be starved by a wedged relay call inside the
        # device worker (the r5 rmax A/B recorded a 300 s arm with ZERO
        # batches because the in-process fallback shared the device
        # worker's compile lock).
        self._helper_jobs = None
        self._helper = None
        if kind != "cpu":
            self._helper_jobs = ctx.Queue(maxsize=2)
            self._helper = ctx.Process(
                target=_worker_main,
                args=(self._helper_jobs, self._results, "cpu", self.batch,
                      16, "cpu"),
                daemon=True, name="device-assist-cpu")
            self._helper.start()

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

    def _handle_control(self, msg) -> bool:
        """True if msg was a control message (consumed)."""
        tag = msg[0]
        if tag == "hello":
            self.stats["worker_platform"] = msg[1]
            if msg[1] == "cpu" and self._kind == "tpu" and self.rmax > 16:
                # accelerator requested but absent (e.g. relay outage at
                # process start): width-20 on the host backend would mean
                # interpret-mode pallas occupying both host CPUs — clamp
                # to the width-16 enumeration kernel instead.
                self.rmax = 16
                self._worker_hot = True
                self.stats["rmax_clamped"] = True
            return True
        if tag == "warmed":
            self._worker_hot = True
            self.stats["t_worker_warm_s"] = round(msg[1], 1)
            return True
        if tag == "warmfail":
            # device program never came up: pin the worker's CPU path
            # (width-16 enumeration) for the rest of the run
            self.rmax = min(self.rmax, 16)
            self._worker_hot = True
            self.stats["warm_failed"] = msg[1]
            return True
        if tag == "err":
            raise RuntimeError(f"device-assist worker failed: {msg[1]}")
        return False

    def _drop_stale(self, res) -> bool:
        """True if res is a late reply to a watchdog-abandoned batch; the
        reply itself is proof of life, so the device path re-enables."""
        if res[0] == "res" and res[1] in self._stale:
            self._stale.discard(res[1])
            if not self._worker_hot:
                self._worker_hot = True
                self.stats["device_reenabled"] = (
                    self.stats.get("device_reenabled", 0) + 1)
            return True
        return False

    def tick(self, ls) -> int:
        """Poll/advance the assist pipeline; returns patches applied now.

        Never blocks: if the device batch (or its one-time program load)
        is still in flight the caller goes straight back to searching.
        Batches the device worker can't take — pre-warm, width-clamped,
        or watchdog-disabled — go to the dedicated CPU-helper process,
        so assist throughput never depends on the relay being alive.
        """
        t0 = time.perf_counter()
        applied = 0
        res = None
        if self._pending is not None:
            while True:
                try:
                    res = self._results.get_nowait()
                except queue.Empty:
                    res = None
                    p = self._pending
                    if (p["watch"] and time.perf_counter() - p["t0"]
                            > self.device_batch_timeout_s):
                        # post-warm watchdog: the device batch is stuck
                        # (relay execution collapse) — abandon it and
                        # route new batches to the CPU helper
                        self._stale.add(p["seq"])
                        self._pending = None
                        self._worker_hot = False
                        self.stats["batches_abandoned"] = (
                            self.stats.get("batches_abandoned", 0) + 1)
                        break
                    self.stats["t_host_s"] += time.perf_counter() - t0
                    return 0
                if self._handle_control(res) or self._drop_stale(res):
                    res = None
                    continue
                break
        else:
            # no batch in flight: still drain control notices ("hello",
            # "warmed") and stale replies so state stays current
            while True:
                try:
                    msg = self._results.get_nowait()
                except queue.Empty:
                    break
                if not self._handle_control(msg):
                    self._drop_stale(msg)

        if res is not None:
            p = self._pending
            self._pending = None
            ids, ks = p["ids"], p["ks"]
            _tag, _seq, bc, bs, t_dev, path = res
            self.stats["t_device_s"] += t_dev
            self.stats["batches_" + path] += 1
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

        if self._pending is None:
            # dispatch the next batch (clamped to width 16 whenever the
            # device worker can't take it — the helper solves width 16)
            rmax = self.rmax if self._worker_hot else min(self.rmax, 16)
            centers = self._sample_centers(ls)
            if len(centers):
                ids, adj, w, ks = ls.extract_regions(centers, rmax=rmax)
                if len(centers) < self.batch:  # keep one program shape
                    pad = self.batch - len(centers)
                    adj = np.pad(adj, ((0, pad), (0, 0)))
                    w = np.pad(w, ((0, pad), (0, 0)))
                    ids = np.pad(ids, ((0, pad), (0, 0)))
                    ks = np.pad(ks, (0, pad))
                self.stats["regions"] += int((ks > 0).sum())
                self._seq += 1
                to_device = (self._helper_jobs is None
                             or (self._worker_hot
                                 and adj.shape[1] == self._width))
                self._pending = {
                    "ids": ids, "ks": ks, "seq": self._seq,
                    "t0": time.perf_counter(),
                    "watch": to_device and self._helper_jobs is not None,
                }
                q = self._jobs if to_device else self._helper_jobs
                q.put((self._seq, adj, w))
        self.stats["t_host_s"] += time.perf_counter() - t0
        return applied

    def stop(self, timeout: float = 3.0):
        """Shutdown: ask the workers to drain; terminate any whose one-time
        program compile is still in flight (short runs) — a clean SIGTERM
        on a separate process, nothing to unwind in the solver."""
        workers = [(self._worker, self._jobs)]
        if self._helper is not None:
            workers.append((self._helper, self._helper_jobs))
        for w, q in workers:
            try:
                q.put_nowait(None)
            except queue.Full:
                pass
        for w, _q in workers:
            w.join(timeout)
            if w.is_alive():
                w.terminate()
                w.join(2.0)
        # never let unflushed queue buffers block interpreter exit
        qs = [self._jobs, self._results]
        if self._helper_jobs is not None:
            qs.append(self._helper_jobs)
        for q in qs:
            try:
                q.cancel_join_thread()
                q.close()
            except Exception:
                pass
