from gnn_mwvc_tpu.core import baseline_solve  # noqa: F401
