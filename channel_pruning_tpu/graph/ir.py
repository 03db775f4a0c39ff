"""Functional graph IR.

Replaces the reference's mutable triple state — pycaffe net + NetBuilder
protobuf + pending-weights WPQ dict (lib/net.py:47-120, lib/builder.py:119-886)
— with immutable dataclasses. Every surgery op is a pure rewrite returning a
new Graph (see channel_pruning_tpu.graph.rewrite); parameters live in a
separate pytree keyed by layer name so graphs are hashable and can be passed
to jit as static arguments.

Layer types mirror the ~12 Caffe layer types the pipeline needs
(SURVEY.md §2.2): Convolution, ReLU, Pooling, Eltwise, InnerProduct,
BatchNorm, Scale, Dropout, Softmax, Accuracy, Flatten, Concat, plus `Select`
(our static channel gather — the TPU-native equivalent of the Caffe fork's
`Filter` layer, lib/builder.py:659-672).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Iterable, Mapping


class LT:
    """Layer type names (Caffe-compatible strings where applicable)."""

    INPUT = "Input"
    CONV = "Convolution"
    RELU = "ReLU"
    POOL = "Pooling"
    ELTWISE = "Eltwise"
    FC = "InnerProduct"
    BN = "BatchNorm"
    SCALE = "Scale"
    DROPOUT = "Dropout"
    SOFTMAX = "Softmax"
    SOFTMAX_LOSS = "SoftmaxWithLoss"
    ACCURACY = "Accuracy"
    FLATTEN = "Flatten"
    CONCAT = "Concat"
    SELECT = "Select"  # static channel gather (Caffe-fork `Filter` equivalent)
    DATA = "Data"
    IMAGE_DATA = "ImageData"
    MEMORY_DATA = "MemoryData"


_DATA_TYPES = (LT.DATA, LT.IMAGE_DATA, LT.MEMORY_DATA, LT.INPUT)


def _freeze(value: Any) -> Any:
    if isinstance(value, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    return value


@dataclass(frozen=True)
class TensorSpec:
    name: str
    shape: tuple[int, ...]  # NCHW (Caffe convention) or (N, D)


@dataclass(frozen=True)
class Layer:
    name: str
    type: str
    bottoms: tuple[str, ...] = ()
    tops: tuple[str, ...] = ()
    # attrs stored as a sorted tuple of (key, value) pairs for hashability
    attrs: tuple[tuple[str, Any], ...] = ()

    @staticmethod
    def make(name: str, type: str, bottoms: Iterable[str] = (), tops: Iterable[str] | None = None,
             **attrs: Any) -> "Layer":
        tops = tuple(tops) if tops is not None else (name,)
        return Layer(name=name, type=type, bottoms=tuple(bottoms), tops=tops,
                     attrs=_freeze(attrs))

    @property
    def attr_dict(self) -> dict[str, Any]:
        return dict(self.attrs)

    def attr(self, key: str, default: Any = None) -> Any:
        for k, v in self.attrs:
            if k == key:
                return v
        return default

    def with_attrs(self, **updates: Any) -> "Layer":
        d = self.attr_dict
        d.update(updates)
        return replace(self, attrs=_freeze(d))

    def with_bottoms(self, bottoms: Iterable[str]) -> "Layer":
        return replace(self, bottoms=tuple(bottoms))

    def with_tops(self, tops: Iterable[str]) -> "Layer":
        return replace(self, tops=tuple(tops))

    def renamed(self, name: str, rename_top: bool = True) -> "Layer":
        tops = tuple(name if t == self.name and rename_top else t for t in self.tops)
        return replace(self, name=name, tops=tops)

    # --- conv helpers -----------------------------------------------------
    def conv_geometry(self) -> dict[str, int]:
        """Resolved (kh, kw, sh, sw, ph, pw, group) for CONV layers."""
        a = self.attr_dict
        kh = a.get("kernel_h", a.get("kernel_size", 1))
        kw = a.get("kernel_w", a.get("kernel_size", 1))
        sh = a.get("stride_h", a.get("stride", 1))
        sw = a.get("stride_w", a.get("stride", 1))
        ph = a.get("pad_h", a.get("pad", 0))
        pw = a.get("pad_w", a.get("pad", 0))
        return {"kh": int(kh), "kw": int(kw), "sh": int(sh), "sw": int(sw),
                "ph": int(ph), "pw": int(pw), "group": int(a.get("group", 1))}


@dataclass(frozen=True)
class Graph:
    """An immutable, topologically ordered layer list.

    The executor (ops/forward.py) interprets layers in order; rewrites
    maintain topological order by construction (mirrors NetBuilder's
    `bringforward` repositioning, lib/builder.py:222-248, without the
    mutation hazards).
    """

    name: str
    inputs: tuple[TensorSpec, ...]
    layers: tuple[Layer, ...]

    # --- lookups ----------------------------------------------------------
    def layer(self, name: str) -> Layer:
        for l in self.layers:
            if l.name == name:
                return l
        raise KeyError(f"no layer named {name!r}")

    def has_layer(self, name: str) -> bool:
        return any(l.name == name for l in self.layers)

    def index(self, name: str) -> int:
        for i, l in enumerate(self.layers):
            if l.name == name:
                return i
        raise KeyError(name)

    def by_type(self, *types: str) -> tuple[Layer, ...]:
        return tuple(l for l in self.layers if l.type in types)

    def names_by_type(self, *types: str) -> tuple[str, ...]:
        return tuple(l.name for l in self.layers if l.type in types)

    @property
    def convs(self) -> tuple[str, ...]:
        return self.names_by_type(LT.CONV)

    @property
    def relus(self) -> tuple[str, ...]:
        return self.names_by_type(LT.RELU)

    @property
    def pools(self) -> tuple[str, ...]:
        return self.names_by_type(LT.POOL)

    @property
    def sums(self) -> tuple[str, ...]:
        return self.names_by_type(LT.ELTWISE)

    @property
    def bns(self) -> tuple[str, ...]:
        return self.names_by_type(LT.BN)

    @property
    def scales(self) -> tuple[str, ...]:
        return self.names_by_type(LT.SCALE)

    @property
    def fcs(self) -> tuple[str, ...]:
        return self.names_by_type(LT.FC)

    def producer(self, tensor: str) -> Layer | None:
        """The layer producing `tensor` (last writer wins, supporting
        in-place chains like conv->relu(top=conv))."""
        result = None
        for l in self.layers:
            if tensor in l.tops:
                result = l
        return result

    def producer_before(self, tensor: str, before: str) -> Layer | None:
        """Last writer of `tensor` occurring before layer `before`."""
        result = None
        for l in self.layers:
            if l.name == before:
                break
            if tensor in l.tops:
                result = l
        return result

    def consumers(self, tensor: str) -> tuple[Layer, ...]:
        return tuple(l for l in self.layers if tensor in l.bottoms)

    def bottom_of(self, name: str) -> str:
        """Single bottom tensor of a layer (asserts arity 1)."""
        l = self.layer(name)
        assert len(l.bottoms) == 1, f"{name} has {len(l.bottoms)} bottoms"
        return l.bottoms[0]

    def outputs(self) -> tuple[str, ...]:
        """Tensors produced but never consumed."""
        consumed = {b for l in self.layers for b in l.bottoms}
        outs = []
        for l in self.layers:
            for t in l.tops:
                if t not in consumed and t not in outs:
                    outs.append(t)
        # drop tensors that a later layer overwrote in place
        final = [t for t in outs if self.producer(t) is not None]
        return tuple(final)

    @property
    def data_layers(self) -> tuple[Layer, ...]:
        return self.by_type(*_DATA_TYPES)

    # --- pure structural edits (used by rewrite.py) -----------------------
    def replace_layer(self, name: str, new_layer: Layer) -> "Graph":
        idx = self.index(name)
        layers = self.layers[:idx] + (new_layer,) + self.layers[idx + 1:]
        return replace(self, layers=layers)

    def insert_after(self, name: str, new_layer: Layer) -> "Graph":
        idx = self.index(name)
        layers = self.layers[:idx + 1] + (new_layer,) + self.layers[idx + 1:]
        return replace(self, layers=layers)

    def insert_at(self, idx: int, new_layer: Layer) -> "Graph":
        layers = self.layers[:idx] + (new_layer,) + self.layers[idx:]
        return replace(self, layers=layers)

    def without(self, name: str) -> "Graph":
        idx = self.index(name)
        return replace(self, layers=self.layers[:idx] + self.layers[idx + 1:])

    def map_layers(self, fn) -> "Graph":
        return replace(self, layers=tuple(fn(l) for l in self.layers))

    def ancestors_subgraph(self, tensors: Iterable[str]) -> "Graph":
        """The minimal subgraph producing `tensors`: backward reachability
        from their producers. Extraction replays run this instead of the
        full net — layers after the captured tensor (for VGG, the 100M-mult
        FC stack) are never computed."""
        targets = set(tensors)
        needed: set[str] = set()
        # walk layers in reverse topological order collecting ancestors
        needed_tensors = set(targets)
        keep: list[Layer] = []
        for l in reversed(self.layers):
            if any(t in needed_tensors for t in l.tops) or l.name in needed:
                keep.append(l)
                needed_tensors.update(l.bottoms)
        keep.reverse()
        g = replace(self, layers=tuple(keep))
        g.validate()
        return g

    # --- validation -------------------------------------------------------
    def validate(self) -> None:
        """Every bottom must be defined by an earlier layer or a graph input."""
        available = {spec.name for spec in self.inputs}
        names = set()
        for l in self.layers:
            if l.name in names:
                raise ValueError(f"duplicate layer name {l.name!r}")
            names.add(l.name)
            if l.type not in _DATA_TYPES:
                for b in l.bottoms:
                    if b not in available:
                        raise ValueError(f"layer {l.name!r} consumes undefined tensor {b!r}")
            available.update(l.tops)


def shapes_of(graph: Graph, params: Mapping[str, Mapping[str, Any]] | None = None,
              batch: int | None = None) -> dict[str, tuple[int, ...]]:
    """Static shape inference over the graph (NCHW).

    Matches Caffe semantics: conv output floor((H+2p-k)/s)+1; pooling uses
    CEIL mode (Caffe's pooling_layer.cpp behaviour — the reason ResNet-50
    pool1 yields 56 not 55).
    """
    env: dict[str, tuple[int, ...]] = {}
    for spec in graph.inputs:
        shape = spec.shape if batch is None else (batch,) + tuple(spec.shape[1:])
        env[spec.name] = tuple(shape)

    def ceil_div(a: int, b: int) -> int:
        return -(-a // b)

    for l in graph.layers:
        if l.type in _DATA_TYPES:
            continue
        if l.type == LT.CONV:
            n, c, h, w = env[l.bottoms[0]]
            g = l.conv_geometry()
            num_out = int(l.attr("num_output"))
            oh = (h + 2 * g["ph"] - g["kh"]) // g["sh"] + 1
            ow = (w + 2 * g["pw"] - g["kw"]) // g["sw"] + 1
            env[l.tops[0]] = (n, num_out, oh, ow)
        elif l.type == LT.POOL:
            n, c, h, w = env[l.bottoms[0]]
            if l.attr("global_pooling", False):
                env[l.tops[0]] = (n, c, 1, 1)
            else:
                k = int(l.attr("kernel_size"))
                s = int(l.attr("stride", 1))
                p = int(l.attr("pad", 0))
                if l.attr("ceil_mode", True):
                    oh = ceil_div(h + 2 * p - k, s) + 1
                    ow = ceil_div(w + 2 * p - k, s) + 1
                    # Caffe clips the last window to start inside the
                    # (padded) input
                    if p > 0:
                        if (oh - 1) * s >= h + p:
                            oh -= 1
                        if (ow - 1) * s >= w + p:
                            ow -= 1
                else:  # floor mode (torch-style; Xception)
                    oh = (h + 2 * p - k) // s + 1
                    ow = (w + 2 * p - k) // s + 1
                env[l.tops[0]] = (n, c, oh, ow)
        elif l.type == LT.FC:
            shp = env[l.bottoms[0]]
            n = shp[0]
            env[l.tops[0]] = (n, int(l.attr("num_output")))
        elif l.type == LT.FLATTEN:
            shp = env[l.bottoms[0]]
            flat = 1
            for d in shp[1:]:
                flat *= d
            env[l.tops[0]] = (shp[0], flat)
        elif l.type == LT.ELTWISE:
            env[l.tops[0]] = env[l.bottoms[0]]
        elif l.type == LT.CONCAT:
            shp = list(env[l.bottoms[0]])
            axis = int(l.attr("axis", 1))
            shp[axis] = sum(env[b][axis] for b in l.bottoms)
            env[l.tops[0]] = tuple(shp)
        elif l.type == LT.SELECT:
            shp = list(env[l.bottoms[0]])
            if l.attr("indices") is not None and not l.attr("passthrough", False):
                shp[1] = int(l.attr("num_output"))
            env[l.tops[0]] = tuple(shp)
        elif l.type in (LT.SOFTMAX_LOSS, LT.ACCURACY):
            env[l.tops[0]] = ()
        else:  # shape-preserving: ReLU, BN, Scale, Dropout, Softmax
            env[l.tops[0]] = env[l.bottoms[0]]
    return env
