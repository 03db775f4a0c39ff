"""Profiling helpers: JAX device traces + forward timing.

Replaces the reference's `caffe time` (lib/net.py:1755-1760) and the Timer
wall-clocks around each R3 phase (lib/utils.py:99-123) with XLA-aware
measurement: explicit block_until_ready fencing and optional profiler traces
viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_forward(graph, params, batch: int | None = None, iters: int = 20,
                 warmup: int = 3) -> dict[str, float]:
    """Latency/throughput of the jitted forward (the `caffe time` numbers).

    Returns mean/p50/p95 latency (ms) and images/sec.
    """
    from channel_pruning_tpu.ops.forward import build_forward, to_device_params

    shape = graph.inputs[0].shape
    b = batch or shape[0]
    x = jax.numpy.asarray(
        np.random.default_rng(0).normal(0, 1, (b,) + tuple(shape[1:]))
        .astype(np.float32))
    dev = to_device_params(params)
    fwd = build_forward(graph)
    input_name = graph.inputs[0].name

    def run_once():
        outs, _ = fwd(dev, {input_name: x})
        # scalar host fetch: the only reliable execution fence through the
        # axon relay (block_until_ready returns before remote completion)
        return float(sum(o.sum() for o in outs.values()))

    for _ in range(warmup):
        run_once()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "batch": float(b),
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "p95_ms": float(np.percentile(times, 95) * 1e3),
        "images_per_sec": float(b / times.mean()),
    }
