from gnn_mwvc_tpu.core.api import (  # noqa: F401
    CoreSolver,
    CoreLocalSearch,
    improve_cover,
    approx_cover,
    greedy_cover,
    baseline_solve,
    bfs_order,
    cluster_order,
    pair_order,
    blocked_pack,
    relabel_csr,
    lib_path,
)
