from gnn_mwvc_tpu.solver.pipeline import solve, SolveResult, GnnScorer  # noqa: F401
