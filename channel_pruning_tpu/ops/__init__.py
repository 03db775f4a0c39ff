from channel_pruning_tpu.ops.forward import build_forward, run_graph  # noqa: F401
