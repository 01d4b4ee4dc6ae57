from gnn_mwvc_tpu.utils.metrics import PhaseTimer, SolveMetrics, trace_span  # noqa: F401
