from channel_pruning_tpu.graph.ir import Graph, Layer, TensorSpec  # noqa: F401
