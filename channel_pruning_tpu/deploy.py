"""Serving/deployment export.

The reference's deployment story is "hand the pruned prototxt+caffemodel to
stock Caffe" (README.md:100). TPU-native serving means shipping a compiled
artifact: `export_serialized` freezes the jitted forward (weights baked in as
constants or passed as inputs) into a portable StableHLO payload via
jax.export, reloadable without the framework.
"""
from __future__ import annotations

from pathlib import Path
from typing import Mapping

import jax
import jax.numpy as jnp

from channel_pruning_tpu.graph.ir import Graph
from channel_pruning_tpu.ops.forward import run_graph, to_device_params


def serving_fn(graph: Graph, params: Mapping | None = None,
               output: str | None = None):
    """fn(x) (params baked) or fn(params, x) -> output tensor (default: the
    last graph output)."""
    input_name = graph.inputs[0].name
    out_name = output or graph.outputs()[-1]

    if params is not None:
        dev = to_device_params(params)

        def fn(x):
            outs, caps = run_graph(graph, dev, {input_name: x},
                                   capture=(out_name,))
            return caps.get(out_name, outs.get(out_name))

        return fn

    def fn(p, x):
        outs, caps = run_graph(graph, p, {input_name: x}, capture=(out_name,))
        return caps.get(out_name, outs.get(out_name))

    return fn


def export_serialized(graph: Graph, params: Mapping, path: str | Path,
                      batch: int | None = None, output: str | None = None
                      ) -> bytes:
    """Serialize the weights-baked forward to StableHLO bytes (jax.export).
    The artifact replays on any machine with jax installed — no
    channel_pruning_tpu dependency."""
    from jax import export as jexport

    shape = graph.inputs[0].shape
    b = batch or shape[0]
    fn = serving_fn(graph, params, output)
    spec = jax.ShapeDtypeStruct((b,) + tuple(shape[1:]), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    payload = exported.serialize()
    Path(path).write_bytes(payload)
    return payload


def load_serialized(path: str | Path):
    """Rehydrate an exported forward: returns fn(x)."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return lambda x: exported.call(jnp.asarray(x, jnp.float32))
