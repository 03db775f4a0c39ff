"""Device-side calibration input source.

The reference feeds calibration from an LMDB/ImageData layer and replays it
via MemoryData (lib/net.py:352-356, 749-802).  This framework's synthetic
calibration mode (smoke/bench, no ImageNet in the environment) used to
materialise the whole set on the host and push it through the tunnel —
~2.9 GB of f32 for the VGG-16/500-batch configuration, the single largest
transfer of the freeze AND the rolling-replay phases.

`SyntheticInputs` replaces the host array with a deterministic device-side
generator: each calibration batch i is `normal(fold_in(key, i))`, produced
by ONE jitted program per chunk shape directly in HBM.  Determinism is
per-batch (not per-chunk), so any chunking of the same logical set —
freeze at 20 batches/step, replays at 4, the HBM-clamped detection path —
sees bit-identical images.  The frozen cache stores the 4-integer spec
instead of the array.

Everything that consumes calibration inputs goes through `device_chunk()`
(sampler chunk loops, rolling-frontier group construction), which makes a
host ndarray and a SyntheticInputs interchangeable.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _batch_gen(sample_shape: tuple[int, ...], n: int):
    """jit fn(key, idxs (n,)) -> (n,) + sample_shape of unit normals, one
    independent stream per batch index."""

    @jax.jit
    def fn(key, idxs):
        return jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                        sample_shape, jnp.float32))(idxs)

    return fn


@dataclass(frozen=True)
class SyntheticInputs:
    """A (n_batches, bs, *sample_shape) calibration set that exists only as
    a PRNG spec; batches are generated on device on demand."""

    n_batches: int
    bs: int
    sample_shape: tuple[int, ...]          # (C, H, W)
    seed: int = 0

    @property
    def shape(self) -> tuple[int, ...]:
        return (self.n_batches, self.bs) + tuple(self.sample_shape)

    @property
    def dtype(self):
        return np.float32

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * 4

    def device_chunk(self, lo: int, hi: int) -> jax.Array:
        """Batches [lo, hi) as a flat ((hi-lo)*bs, *sample_shape) device
        array — the same rows `host()[lo:hi].reshape(-1, ...)` would hold."""
        fn = _batch_gen((self.bs,) + tuple(self.sample_shape), hi - lo)
        key = jax.random.PRNGKey(self.seed)
        out = fn(key, jnp.arange(lo, hi, dtype=jnp.uint32))
        return out.reshape((-1,) + tuple(self.sample_shape))

    def host(self) -> np.ndarray:
        """Materialise the full set on the host (tests / real-array parity)."""
        return np.asarray(self.device_chunk(0, self.n_batches)).reshape(
            self.shape)

    # --- frozen-cache (de)serialisation -----------------------------------
    def spec(self) -> np.ndarray:
        return np.asarray([self.n_batches, self.bs, self.seed]
                          + list(self.sample_shape), np.int64)

    @staticmethod
    def from_spec(spec: np.ndarray) -> "SyntheticInputs":
        spec = [int(v) for v in np.asarray(spec)]
        return SyntheticInputs(n_batches=spec[0], bs=spec[1], seed=spec[2],
                               sample_shape=tuple(spec[3:]))


def device_chunk(inputs, lo: int, hi: int) -> jax.Array:
    """Flat ((hi-lo)*bs, C, H, W) device slice of a calibration source —
    generated in HBM for SyntheticInputs, sliced device-side for an already
    HBM-resident (jax.Array) source, uploaded (chunked against the tunnel's
    first-transfer pathology) for host arrays."""
    if isinstance(inputs, SyntheticInputs):
        return inputs.device_chunk(lo, hi)
    if isinstance(inputs, jax.Array):
        return inputs[lo:hi].reshape((-1,) + tuple(inputs.shape[2:]))
    from channel_pruning_tpu.utils.runtime import chunked_device_put

    return chunked_device_put(
        np.asarray(inputs[lo:hi]).reshape((-1,) + tuple(inputs.shape[2:])))
