"""Device mesh utilities.

The reference's device story was CUDA_VISIBLE_DEVICES pool-splitting +
Caffe-internal NCCL (SURVEY.md §2.3). Here a single JAX process owns every
TPU core; parallel plans are shardings over one `jax.sharding.Mesh`:

  * "data"  — batch dimension (finetune DP, sampling forward)
  * "sample" — solver sample-matrix rows (the N=50k dimension; Gram/cross
    matrices are psum-reduced across it — this framework's analogue of
    sequence parallelism, SURVEY.md §5)
"""
from __future__ import annotations

import numpy as np
import jax

P = jax.sharding.PartitionSpec


def make_mesh(n_devices: int | None = None, axis: str = "data") -> jax.sharding.Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.sharding.Mesh(np.array(devs[:n]), (axis,))


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, P())


def batch_sharded(mesh: jax.sharding.Mesh, axis: str | None = None
                  ) -> jax.sharding.NamedSharding:
    axis = axis or mesh.axis_names[0]
    return jax.sharding.NamedSharding(mesh, P(axis))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0
                    ) -> tuple[np.ndarray, int]:
    """Zero-pad axis length to a device-count multiple (static-shape friendly
    sharding). Returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return np.pad(x, pads), n
