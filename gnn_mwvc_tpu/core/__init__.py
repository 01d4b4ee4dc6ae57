from gnn_mwvc_tpu.core.api import CoreSolver, CoreLocalSearch, lib_path  # noqa: F401
