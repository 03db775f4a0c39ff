"""FLOPs (multiply-count) accounting over the graph IR.

Capability parity with the reference's layercomputation/computation/
rescomputation (lib/net.py:1049-1104) and the flop/resnet CLI actions
(tools.py:36-51): per-layer multiply counts from static shape inference,
whole-net totals with per-mille breakdown, and speed-up ratios against the
published denominators (VGG 15,346,630,656 — lib/cfgs.py:66; ResNet-50
5,036,310,528 — lib/net.py:1084).
"""
from __future__ import annotations

from typing import Mapping

from channel_pruning_tpu.graph.ir import Graph, LT, shapes_of


def layer_flops(graph: Graph, shapes: Mapping[str, tuple[int, ...]],
                name: str) -> int:
    """Multiplies for one layer at batch size 1 (reference layercomputation,
    lib/net.py:1049-1067: out_h*out_w*k_h*k_w*c_in/group*c_out)."""
    l = graph.layer(name)
    if l.type == LT.CONV:
        geo = l.conv_geometry()
        n, c_out, oh, ow = shapes[l.tops[0]]
        c_in = shapes[l.bottoms[0]][1]
        return oh * ow * geo["kh"] * geo["kw"] * (c_in // geo["group"]) * c_out
    if l.type == LT.FC:
        c_out = int(l.attr("num_output"))
        shp = shapes[l.bottoms[0]]
        fan_in = 1
        for d in shp[1:]:
            fan_in *= d
        return fan_in * c_out
    return 0


def total_flops(graph: Graph, batch: int = 1, include_fc: bool = True,
                verbose: bool = False) -> int:
    """Whole-net multiply count at batch 1 (reference computation,
    lib/net.py:1069-1081 — conv layers only there; FC included by flag)."""
    shapes = shapes_of(graph, batch=1)
    types = (LT.CONV, LT.FC) if include_fc else (LT.CONV,)
    per = {l.name: layer_flops(graph, shapes, l.name)
           for l in graph.layers if l.type in types}
    total = sum(per.values())
    if verbose and total:
        for k, v in per.items():
            print(f"  {k:>20s}: {v:>14,d}  ({1000.0 * v / total:.1f}‰)")
    return total * batch


def what_if_flops(graph: Graph, keep: float, match: str = "branch2a",
                  verbose: bool = False) -> int:
    """Projected conv multiply count if every conv whose name contains
    `match` had its output count scaled by `keep` (reference rescomputation,
    lib/net.py:1083-1104 / `tools.py resnet` action: a what-if for ResNet
    pruning where branch2a widths shrink to keep*c_out)."""
    shapes = shapes_of(graph, batch=1)
    total = 0
    for l in graph.layers:
        if l.type != LT.CONV:
            continue
        f = layer_flops(graph, shapes, l.name)
        if match in l.name:
            f = int(f * keep)
        if verbose:
            print(f"  {l.name:>20s}: {f:>14,d}")
        total += f
    return total


def speedup(graph: Graph, original_flops: int, include_fc: bool = False) -> float:
    """original / current multiply ratio (the calflop.sh number,
    tools.py:36-46)."""
    cur = total_flops(graph, include_fc=include_fc)
    return original_flops / cur if cur else float("inf")


def total_params(graph: Graph, params=None, verbose: bool = False) -> int:
    """Parameter count (the reference's `tools.py param` action,
    tools.py:53-61). With a params pytree, counts actual array sizes;
    otherwise derives from static shapes."""
    total = 0
    shapes = shapes_of(graph, batch=1)
    for l in graph.layers:
        n = 0
        if params is not None and l.name in params:
            for v in params[l.name].values():
                size = 1
                for d in getattr(v, "shape", ()):
                    size *= d
                n += size
        elif l.type == LT.CONV:
            geo = l.conv_geometry()
            c_in = shapes[l.bottoms[0]][1] // geo["group"]
            n = int(l.attr("num_output")) * c_in * geo["kh"] * geo["kw"]
            if l.attr("bias", True):
                n += int(l.attr("num_output"))
        elif l.type == LT.FC:
            fan_in = 1
            for d in shapes[l.bottoms[0]][1:]:
                fan_in *= d
            n = int(l.attr("num_output")) * (fan_in + 1)
        if n and verbose:
            print(f"  {l.name:>20s}: {n:>12,d}")
        total += n
    return total
