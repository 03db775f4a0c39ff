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


# Peak dense matmul throughput of one TPU v5e (lite) chip in bf16 —
# the honest speed-of-light denominator for MFU (f32 inputs route through
# the same MXU as bf16 passes).
V5E_PEAK_FLOPS = 197e12


def mfu(total_flops: float, seconds: float,
        peak_flops: float = V5E_PEAK_FLOPS) -> float:
    """Model FLOPs utilisation: achieved / peak (dimensionless, 0..1)."""
    return total_flops / max(seconds, 1e-12) / peak_flops


def time_forward(graph, params, batch: int | None = None, iters: int = 20,
                 warmup: int = 3, compute_dtype=None) -> dict[str, float]:
    """Latency/throughput of the jitted forward (the `caffe time` numbers).

    Returns mean/p50/p95 latency (ms), images/sec, and MFU vs the v5e bf16
    peak (BASELINE metric; the model FLOP count is 2x the conv+fc multiply
    count of utils/flops.py).
    """
    from channel_pruning_tpu.ops.forward import build_forward, to_device_params
    from channel_pruning_tpu.utils import flops as flops_mod

    shape = graph.inputs[0].shape
    b = batch or shape[0]
    x = jax.numpy.asarray(
        np.random.default_rng(0).normal(0, 1, (b,) + tuple(shape[1:]))
        .astype(np.float32))
    dev = to_device_params(params)
    fwd = build_forward(graph, compute_dtype=compute_dtype)
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
    # per-image forward FLOPs: 2 x multiplies (total_flops is batch-1)
    flops_per_image = 2.0 * flops_mod.total_flops(graph)
    return {
        "batch": float(b),
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "p95_ms": float(np.percentile(times, 95) * 1e3),
        "images_per_sec": float(b / times.mean()),
        "mfu": float(mfu(flops_per_image * b, times.mean())),
    }


def time_per_layer(graph, params, batch: int | None = None, steps: int = 20,
                   repeats: int = 2, compute_dtype=None) -> dict:
    """Per-layer forward times — the `caffe time` per-layer table
    (lib/net.py:1755-1760 prints each layer's forward ms).

    Each layer is timed as its OWN fori_loop device program over its real
    captured input tensors (data-dependent chaining so XLA cannot elide the
    iterations), so the per-layer ms reflect chip compute, not per-dispatch
    RTT. Returns {"layers": [{name, type, ms, mults}...], "sum_ms": float}.
    The sum should land within ~10% of time_forward_device_loop's per-step
    number (fusion across layer boundaries accounts for the gap).
    """
    import functools

    import jax.numpy as jnp

    from channel_pruning_tpu.graph.ir import LT, shapes_of
    from channel_pruning_tpu.ops.forward import compute_layer, to_device_params
    from channel_pruning_tpu.utils import flops as flops_mod

    timed_types = (LT.CONV, LT.FC, LT.POOL, LT.ELTWISE, LT.BN, LT.SCALE,
                   LT.RELU, LT.SOFTMAX, LT.CONCAT, LT.SELECT, LT.FLATTEN)
    shape = graph.inputs[0].shape
    b = batch or shape[0]
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 1, (b,) + tuple(shape[1:])).astype(np.float32))
    dev = to_device_params(params)

    # one eager forward pass, snapshotting every timed layer's inputs AT ITS
    # EXECUTION POINT (in-place tops overwrite env entries afterwards)
    env = {graph.inputs[0].name: jnp.transpose(x, (0, 2, 3, 1))}
    layer_inputs: dict[str, list] = {}
    for l in graph.layers:
        if l.type in timed_types and all(bt in env for bt in l.bottoms):
            layer_inputs[l.name] = [env[bt] for bt in l.bottoms]
        compute_layer(l, env, dev, compute_dtype=compute_dtype)

    shapes = shapes_of(graph, batch=1)
    rows = []
    for l in graph.layers:
        if l.name not in layer_inputs:
            continue
        xs = tuple(layer_inputs[l.name])

        @functools.partial(jax.jit, static_argnames=("n",))
        def layer_loop(params, xs, n, l=l):
            def body(_, carry):
                x0, acc = carry
                e = dict(zip(l.bottoms, (x0,) + xs[1:]))
                compute_layer(l, e, params, compute_dtype=compute_dtype)
                s = e[l.tops[0]].sum().astype(jnp.float32)
                # numerically-no-op chaining: XLA cannot collapse the n
                # iterations into one
                return x0 * (1.0 + 1e-30 * s), acc + s
            _, acc = jax.lax.fori_loop(0, n, body, (xs[0], jnp.float32(0)))
            return acc

        float(layer_loop(dev, xs, steps))          # compile + warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(layer_loop(dev, xs, steps))      # scalar fetch = fence
            times.append((time.perf_counter() - t0) / steps)
        rows.append({"layer": l.name, "type": l.type,
                     "ms": float(np.min(times)) * 1e3,
                     "mults": flops_mod.layer_flops(graph, shapes, l.name) * b})
    return {"batch": float(b), "steps": float(steps),
            "layers": rows, "sum_ms": float(sum(r["ms"] for r in rows))}


def time_forward_device_loop(graph, params, batch: int | None = None,
                             steps: int = 20, repeats: int = 3,
                             compute_dtype=None) -> dict[str, float]:
    """Compute-honest forward timing: `steps` forwards chained into ONE
    device program (lax.fori_loop with a data dependency between
    iterations), so the host<->device round-trip — ~25 ms over the tunneled
    chip, half of a per-dispatch step time at batch 64 — is paid once per
    `steps` instead of once per step. This is the number that reflects what
    the chip does, vs `time_forward` which reflects what a per-dispatch
    caller sees (both are real; the reference's `caffe time` is the latter,
    lib/net.py:1760)."""
    from channel_pruning_tpu.ops.forward import run_graph, to_device_params
    from channel_pruning_tpu.utils import flops as flops_mod

    shape = graph.inputs[0].shape
    b = batch or shape[0]
    x0 = jax.numpy.asarray(
        np.random.default_rng(0).normal(0, 1, (b,) + tuple(shape[1:]))
        .astype(np.float32))
    dev = to_device_params(params)
    input_name = graph.inputs[0].name

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, x, n):
        def body(_, carry):
            x, acc = carry
            outs, _ = run_graph(graph, params, {input_name: x},
                                compute_dtype=compute_dtype)
            s = sum(o.sum().astype(jax.numpy.float32)
                    for o in outs.values())
            # 1e-30*s chains the iterations (not algebraically removable,
            # numerically a no-op) so XLA cannot elide or overlap-collapse
            # the n forwards
            return x + 1e-30 * s, acc + s
        _, acc = jax.lax.fori_loop(0, n, body, (x, jax.numpy.float32(0)))
        return acc

    float(loop(dev, x0, steps))            # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(dev, x0, steps))        # scalar fetch = execution fence
        times.append((time.perf_counter() - t0) / steps)
    per_step = float(np.min(times))        # min: least host-noise sample
    flops_per_image = 2.0 * flops_mod.total_flops(graph)
    return {
        "batch": float(b),
        "steps": float(steps),
        "device_ms_per_step": per_step * 1e3,
        "images_per_sec": float(b / per_step),
        "mfu": float(mfu(flops_per_image * b, per_step)),
    }
