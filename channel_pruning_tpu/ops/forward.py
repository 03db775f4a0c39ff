"""Graph executor: interprets the functional IR into XLA ops.

TPU-native replacement for the reference's pycaffe/CUDA forward
(lib/net.py:186-199 -> caffe.Net.forward()). The whole net is traced once
under jit into a single XLA program; activations are NHWC on device (TPU
conv-friendly) while the parameter pytree keeps Caffe layout
(conv W: (O, I/g, kh, kw); fc W: (O, CHW)) so solver math and Caffe
import/export stay layout-compatible.

`capture` returns any interior tensors alongside the outputs — this replaces
the reference's addressable-blob machinery (net.blobs, MemoryData replay)
with a pure function: sampling is "run forward, gather from captures".
"""
from __future__ import annotations

import functools
import zlib
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.graph.ir import Graph, Layer, LT

Params = Mapping[str, Mapping[str, jax.Array]]

_DATA_TYPES = (LT.DATA, LT.IMAGE_DATA, LT.MEMORY_DATA, LT.INPUT)


def _conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None, geo: dict[str, int],
            compute_dtype=None) -> jax.Array:
    """x: NHWC, w: (O, I/g, kh, kw) Caffe layout."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(geo["sh"], geo["sw"]),
        padding=((geo["ph"], geo["ph"]), (geo["pw"], geo["pw"])),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=geo["group"],
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _pool(x: jax.Array, l: Layer) -> jax.Array:
    """Caffe CEIL-mode pooling over NHWC."""
    if l.attr("global_pooling", False):
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    k = int(l.attr("kernel_size"))
    s = int(l.attr("stride", 1))
    p = int(l.attr("pad", 0))
    n, h, w, c = x.shape

    def ceil_div(a: int, b: int) -> int:
        return -(-a // b)

    if l.attr("ceil_mode", True):   # Caffe pooling_layer default
        oh = ceil_div(h + 2 * p - k, s) + 1
        ow = ceil_div(w + 2 * p - k, s) + 1
        if p > 0:
            if (oh - 1) * s >= h + p:
                oh -= 1
            if (ow - 1) * s >= w + p:
                ow -= 1
    else:                            # torch-style floor mode (Xception)
        oh = (h + 2 * p - k) // s + 1
        ow = (w + 2 * p - k) // s + 1
    # right/bottom padding to realise ceil mode with a fixed window walk
    pad_h = (p, max(0, (oh - 1) * s + k - h - p))
    pad_w = (p, max(0, (ow - 1) * s + k - w - p))
    mode = l.attr("pool", "max")
    if mode == "max":
        init = -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.finfo(x.dtype).min
        out = jax.lax.reduce_window(
            x, init, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
            padding=((0, 0), pad_h, pad_w, (0, 0)))
    elif mode == "ave":
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
            padding=((0, 0), pad_h, pad_w, (0, 0)))
        # Caffe average pooling divides by the full window size over
        # zero-padded borders only when pad>0; with pad=0 windows are full.
        counts = jax.lax.reduce_window(
            jnp.ones((1, h, w, 1), x.dtype), 0.0, jax.lax.add,
            (1, k, k, 1), (1, s, s, 1), padding=((0, 0), pad_h, pad_w, (0, 0)))
        out = summed / counts
    else:
        raise NotImplementedError(f"pool mode {mode}")
    return out


def _batchnorm(x: jax.Array, p: Mapping[str, jax.Array], eps: float) -> jax.Array:
    """Caffe BatchNorm inference: blobs = (mean*f, var*f, f) — divide by the
    moving-average factor before normalising (lib/net.py:1106-1112 uses the
    same 1/f scaling when folding)."""
    factor = p.get("factor")
    scale = jnp.where(factor == 0, 1.0, 1.0 / factor) if factor is not None else 1.0
    mean = p["mean"] * scale
    var = p["var"] * scale
    return (x - mean) * jax.lax.rsqrt(var + eps)


def compute_layer(l: Layer, env: dict[str, jax.Array], params: Params,
                  *, train: bool = False, rng: jax.Array | None = None,
                  compute_dtype=None) -> None:
    """Evaluate one layer into env (tensor name -> NHWC array)."""
    t = l.type
    if t in _DATA_TYPES:
        return
    x = env[l.bottoms[0]] if l.bottoms else None
    top = l.tops[0]
    if t == LT.CONV:
        p = params[l.name]
        env[top] = _conv2d(x, p["W"], p.get("b") if l.attr("bias", True) else None,
                           l.conv_geometry(), compute_dtype)
    elif t == LT.RELU:
        env[top] = jnp.maximum(x, 0.0)
    elif t == LT.POOL:
        env[top] = _pool(x, l)
    elif t == LT.ELTWISE:
        op = l.attr("operation", "sum")
        vals = [env[b] for b in l.bottoms]
        if op == "sum":
            coeffs = l.attr("coeff")
            if coeffs:
                vals = [v * c for v, c in zip(vals, coeffs)]
            env[top] = functools.reduce(jnp.add, vals)
        elif op == "max":
            env[top] = functools.reduce(jnp.maximum, vals)
        elif op == "prod":
            env[top] = functools.reduce(jnp.multiply, vals)
        else:
            raise NotImplementedError(op)
    elif t == LT.FC:
        p = params[l.name]
        if x.ndim == 4:
            # Caffe flattens NCHW; we hold NHWC -> transpose before reshape
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        env[top] = x @ p["W"].T + p["b"]
    elif t == LT.BN:
        env[top] = _batchnorm(x, params[l.name], float(l.attr("eps", 1e-5)))
    elif t == LT.SCALE:
        p = params[l.name]
        env[top] = x * p["W"] + p.get("b", 0.0)
    elif t == LT.DROPOUT:
        if train and rng is not None:
            ratio = float(l.attr("dropout_ratio", 0.5))
            keep = 1.0 - ratio
            # crc32, NOT hash(): Python string hashing is salted per process,
            # which made seeded finetune losses irreproducible across runs
            salt = zlib.crc32(l.name.encode()) & 0x7FFFFFFF
            mask = jax.random.bernoulli(jax.random.fold_in(rng, salt),
                                        keep, x.shape)
            env[top] = jnp.where(mask, x / keep, 0.0)
        else:
            env[top] = x
    elif t == LT.SOFTMAX:
        env[top] = jax.nn.softmax(x, axis=-1)
    elif t == LT.FLATTEN:
        if x.ndim == 4:
            x = jnp.transpose(x, (0, 3, 1, 2))
        env[top] = x.reshape(x.shape[0], -1)
    elif t == LT.CONCAT:
        axis = int(l.attr("axis", 1))
        nhwc_axis = {0: 0, 1: 3, 2: 1, 3: 2}[axis]
        env[top] = jnp.concatenate([env[b] for b in l.bottoms], axis=nhwc_axis)
    elif t == LT.SELECT:
        idxs = l.attr("indices")
        if idxs is None or l.attr("passthrough", False):
            env[top] = x  # pure fan-out alias (Caffe Split)
        else:
            # static gather: free at compile time
            env[top] = x[..., jnp.asarray(idxs, jnp.int32)]
    elif t in (LT.SOFTMAX_LOSS, LT.ACCURACY):
        pass  # loss/metric heads handled by the training/eval harness
    else:
        raise NotImplementedError(f"layer type {t}")


def run_graph(graph: Graph, params: Params, inputs: Mapping[str, jax.Array],
              *, capture: Sequence[str] = (), train: bool = False,
              rng: jax.Array | None = None, compute_dtype=None,
              capture_transforms: Mapping[str, Any] | None = None,
              ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Interpret the graph. Inputs/outputs/captures are NCHW at the API
    boundary (Caffe convention, what the solver math expects); activations
    are NHWC internally.

    `capture_transforms` maps a tensor name to fn(NCHW array) -> array,
    applied AT PRODUCTION TIME: only the (small) transformed value is kept
    live, so sampling every conv top of a deep net doesn't pin every full
    feature map in HBM simultaneously (the whole-net freeze pass would
    otherwise need ~13 GB for VGG-16 at 250 images)."""
    env: dict[str, jax.Array] = {}
    for spec in graph.inputs:
        x = inputs[spec.name]
        if x.ndim == 4:
            x = jnp.transpose(x, (0, 2, 3, 1))
        env[spec.name] = x
    capture = tuple(capture)
    caps: dict[str, jax.Array] = {}
    remaining = set(capture) | set(capture_transforms or ())

    def to_nchw(v: jax.Array) -> jax.Array:
        return jnp.transpose(v, (0, 3, 1, 2)) if v.ndim == 4 else v

    for l in graph.layers:
        compute_layer(l, env, params, train=train, rng=rng, compute_dtype=compute_dtype)
        # capture the value of a tensor at the point of production, before
        # any in-place (aliased-top) successor overwrites it
        for tname in l.tops:
            if tname in remaining and tname in env:
                tf = (capture_transforms or {}).get(tname)
                caps[tname] = tf(to_nchw(env[tname])) if tf is not None \
                    else to_nchw(env[tname])
                remaining.discard(tname)

    outputs = {t: to_nchw(env[t]) for t in graph.outputs() if t in env}
    return outputs, caps


def build_forward(graph: Graph, *, capture: Sequence[str] = (), compute_dtype=None,
                  jit: bool = True):
    """Return fn(params, inputs_dict) -> (outputs, captures); jitted with the
    graph baked in as a static constant."""
    capture = tuple(capture)

    def fn(params, inputs):
        return run_graph(graph, params, inputs, capture=capture,
                         compute_dtype=compute_dtype)

    return jax.jit(fn) if jit else fn


def logits_fn(graph: Graph, logits_tensor: str | None = None):
    """Return fn(params, x) -> logits for training/eval. Picks the bottom of
    the Softmax/loss head when not told explicitly."""
    if logits_tensor is None:
        heads = graph.by_type(LT.SOFTMAX, LT.SOFTMAX_LOSS)
        if heads:
            logits_tensor = heads[0].bottoms[0]
        else:
            logits_tensor = graph.outputs()[-1]

    def fn(params, x, train=False, rng=None):
        _, caps = run_graph(graph, params, {graph.inputs[0].name: x},
                            capture=(logits_tensor,), train=train, rng=rng)
        return caps[logits_tensor]

    return fn


def to_device_params(params: Mapping[str, Mapping[str, np.ndarray]]) -> dict:
    """Upload a params pytree, chunking big leaves (FC weights are 400+ MB;
    the degraded axon tunnel wedges on large single-buffer transfers —
    runtime.chunked_device_put)."""
    from channel_pruning_tpu.utils.runtime import chunked_device_put

    return jax.tree_util.tree_map(chunked_device_put,
                                  {k: dict(v) for k, v in params.items()})
