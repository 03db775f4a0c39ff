"""channel_pruning_tpu — TPU-native network compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ethanhe42/channel-pruning ("Channel Pruning for Accelerating Very Deep Neural
Networks", ICCV'17): LASSO channel selection, least-squares weight
reconstruction, spatial (VH) and ReLU-aware channel (ITQ) decomposition,
whole-model 3C compression, Caffe model import/export, data-parallel
finetuning, and FLOPs accounting — all designed TPU-first (static shapes,
batched MXU matmuls, on-device solvers, pjit/shard_map parallelism).
"""

__version__ = "0.1.0"

from channel_pruning_tpu.graph.ir import Graph, Layer, TensorSpec  # noqa: F401
from channel_pruning_tpu.utils.config import Config, default_config  # noqa: F401
