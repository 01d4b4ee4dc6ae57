"""gnn_mwvc_tpu — a TPU-native GNN-guided Minimum Weight Vertex Cover framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
KennethLangedal/GNN-MWVC (SEA 2022): METIS graph IO, a GraphSAGE-style
vertex-scoring GNN, an exact-reduction (kernelization) engine with undo-able
graph surgery, exact sub-solvers for small components, and an anytime weighted
local search — organized TPU-first:

* everything O(E) (message passing, rule predicates, score tables, batched
  subset enumeration) runs on device as segment ops over immutable CSR shards;
* everything sequential (action log, unfold, branch-and-reduce recursion,
  local search) runs on host, fed by async device transfers;
* multi-chip scaling uses edge-partitioned `shard_map` message passing with
  halo exchange over ICI (see `gnn_mwvc_tpu.parallel`).

Reference capability map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compile cache: first-compile of a shape bucket can cost
    minutes on remote-compile TPU setups; cache hits make it ~free across
    processes.  Opt out with GNN_MWVC_NO_COMPILE_CACHE=1."""
    if _os.environ.get("GNN_MWVC_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/gnn_mwvc_tpu/xla_cache"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache setup
        pass


_setup_compilation_cache()

from gnn_mwvc_tpu.graph import Graph  # noqa: F401
