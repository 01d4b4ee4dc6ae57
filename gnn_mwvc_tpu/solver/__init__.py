from gnn_mwvc_tpu.solver.pipeline import solve, SolveResult, GnnScorer  # noqa: F401
from gnn_mwvc_tpu.solver.sharded_score import ShardedGnnScorer  # noqa: F401
