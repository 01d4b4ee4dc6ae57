"""Observability: phase timers, structured per-round metrics, device traces.

The reference's only instrumentation is wall-clock spans around the two
phases (reference: src/GNN_VC.cpp:287-300) and a CSV line at exit; here every
solve can emit structured per-round records (nodes remaining, rule counters,
edges scored, transfer sizes) and wrap device work in `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional

__all__ = ["PhaseTimer", "SolveMetrics", "trace_span"]


class PhaseTimer:
    """Named accumulating wall-clock spans (t_gnn vs t_ls style)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self):
        return {
            k: {"seconds": round(v, 6), "calls": self.counts[k]}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def trace_span(name: str, enabled: bool = True):
    """jax.profiler TraceAnnotation wrapper (no-op when disabled)."""
    if not enabled:
        yield
        return
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


@dataclasses.dataclass
class RoundRecord:
    round: int
    nodes_remaining: int
    edges_scored: int
    decisions: int
    label_count: int
    seconds_score: float
    seconds_peel: float


class SolveMetrics:
    """Structured per-round solve metrics + final summary (JSONL-able)."""

    def __init__(self, sink: Optional[str] = None):
        self.rounds: list[RoundRecord] = []
        self.timer = PhaseTimer()
        self.sink = sink

    def record_round(self, **kw):
        self.rounds.append(RoundRecord(round=len(self.rounds), **kw))

    def record_scorer(self, stats: dict):
        """Scorer-lifecycle stats (sticky rebuilds, prep seconds, legacy
        fallback rounds — see solver/static_score.py)."""
        self.scorer_stats = stats

    def summary(self, **final):
        out = {
            "rounds": [dataclasses.asdict(r) for r in self.rounds],
            "phases": self.timer.as_dict(),
            **final,
        }
        if getattr(self, "scorer_stats", None):
            out["scorer"] = self.scorer_stats
        if self.sink:
            with open(self.sink, "a") as f:
                f.write(json.dumps(out) + "\n")
        return out
