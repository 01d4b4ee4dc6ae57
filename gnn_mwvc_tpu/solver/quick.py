"""GNN-free scoring: pure weight/degree priority (the reference's QUICK_VC
variant, reference: old_files/src/apps/QUICK_VC.cpp:110-160).

QUICK_VC orders vertices by weight descending then degree ascending and
excludes greedily (every vertex scored as an exclusion candidate); the peel
machinery treats a score < 0.5 as "exclude vertex, take its neighborhood".
To reproduce the ordering through the confidence comparator we emit scores
in (0, 0.5) whose confidence margin encodes the priority.
"""

from __future__ import annotations

import numpy as np

__all__ = ["QuickScorer"]


class QuickScorer:
    def __call__(self, snap, weight_scale: float) -> np.ndarray:
        w = snap.weights.astype(np.float64)
        d = np.maximum(snap.deg.astype(np.float64), 1.0)
        # Priority: heavy, low-degree vertices are the best exclusions.
        # Map to a score in (0, 0.5): higher priority -> closer to 0
        # (higher confidence), so the confidence sort peels them first.
        prio = (w / weight_scale) / d
        prio = prio / max(prio.max(), 1e-9)
        return (0.5 - 0.4999 * prio).astype(np.float32)
