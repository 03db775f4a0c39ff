"""ResNet-50 graph builder (Caffe naming: res2a_branch2a / bn2a_branch2a /
scale2a_branch2a ..., matching the reference's temp/resnet-50-cp.prototxt
topology so pruned-graph golden checks can compare layer-for-layer).

The pruned variant inserts `Select` layers (our static channel gather — the
TPU-native equivalent of the Caffe fork's `Filter` layer with
filter_param.num_output, temp/resnet-50-cp.prototxt:109-120) in front of each
residual block's branch2a conv.
"""
from __future__ import annotations

import numpy as np

from channel_pruning_tpu.graph.ir import Graph, Layer, LT, TensorSpec

RESNET50_FLOPS = 5_036_310_528  # the reference's hardcoded denominator
# (lib/net.py:1084). NB: true conv multiply count of this architecture is
# 3,855,925,248 under output-resolution accounting (utils/flops.py); the
# reference's constant inflates stride-2 convs by using input resolution.
# Speed-up ratios stay comparable because the reference applies the same
# accounting to both sides (their released 2x model measures 1.94x under
# either convention).

# (stage index, number of blocks, bottleneck width, output width)
RESNET50_STAGES = ((2, 3, 64, 256), (3, 4, 128, 512), (4, 6, 256, 1024), (5, 3, 512, 2048))

_BLOCK_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _conv_bn(layers: list[Layer], name: str, bottom: str, num_output: int,
             kernel: int, stride: int, pad: int, bn_prefix: str, relu: bool,
             inplace: bool = True) -> str:
    layers.append(Layer.make(name, LT.CONV, [bottom], num_output=num_output,
                             kernel_size=kernel, stride=stride, pad=pad, bias=False))
    layers.append(Layer.make(f"bn{bn_prefix}", LT.BN, [name], [name], eps=1e-9))
    layers.append(Layer.make(f"scale{bn_prefix}", LT.SCALE, [name], [name], bias=True))
    if relu:
        layers.append(Layer.make(f"{name}_relu", LT.RELU, [name], [name]))
    return name


def build_resnet50(batch: int = 10, image_size: int = 224, num_classes: int = 1000,
                   stages=RESNET50_STAGES, stem_width: int = 64,
                   name: str = "resnet50") -> Graph:
    layers: list[Layer] = []
    _conv_bn(layers, "conv1", "data", stem_width, kernel=7, stride=2, pad=3,
             bn_prefix="_conv1", relu=True)
    layers.append(Layer.make("pool1", LT.POOL, ["conv1"], pool="max",
                             kernel_size=3, stride=2))
    prev = "pool1"

    for stage, blocks, width, out_width in stages:
        for bi in range(blocks):
            letter = _BLOCK_LETTERS[bi]
            tag = f"{stage}{letter}"
            block = f"res{tag}"
            stride = 2 if (bi == 0 and stage > 2) else 1
            if bi == 0:
                shortcut = _conv_bn(layers, f"{block}_branch1", prev, out_width,
                                    kernel=1, stride=stride, pad=0,
                                    bn_prefix=f"{tag}_branch1", relu=False)
            else:
                shortcut = prev
            b2a = _conv_bn(layers, f"{block}_branch2a", prev, width, kernel=1,
                           stride=stride, pad=0, bn_prefix=f"{tag}_branch2a", relu=True)
            b2b = _conv_bn(layers, f"{block}_branch2b", b2a, width, kernel=3,
                           stride=1, pad=1, bn_prefix=f"{tag}_branch2b", relu=True)
            b2c = _conv_bn(layers, f"{block}_branch2c", b2b, out_width, kernel=1,
                           stride=1, pad=0, bn_prefix=f"{tag}_branch2c", relu=False)
            layers.append(Layer.make(block, LT.ELTWISE, [shortcut, b2c], operation="sum"))
            layers.append(Layer.make(f"{block}_relu", LT.RELU, [block], [block]))
            prev = block

    layers.append(Layer.make("pool5", LT.POOL, [prev], pool="ave",
                             global_pooling=True))
    layers.append(Layer.make("fc1000", LT.FC, ["pool5"], num_output=num_classes, bias=True))
    layers.append(Layer.make("prob", LT.SOFTMAX, ["fc1000"]))

    g = Graph(name=name,
              inputs=(TensorSpec("data", (batch, 3, image_size, image_size)),),
              layers=tuple(layers))
    g.validate()
    return g


def build_tiny_resnet(batch: int = 4, image_size: int = 32, num_classes: int = 10,
                      seed: int = 0):
    """Miniature bottleneck ResNet for CPU tests (2 stages, 2 blocks each)."""
    from channel_pruning_tpu.models.vgg import init_params

    stages = ((2, 2, 8, 16), (3, 2, 12, 24))
    g = build_resnet50(batch=batch, image_size=image_size, num_classes=num_classes,
                       stages=stages, stem_width=8, name="tiny_resnet")
    params = init_params(g, seed=seed)
    # give BN layers non-trivial statistics so fold/merge tests are meaningful
    rng = np.random.default_rng(seed + 1)
    for lname, p in params.items():
        if "mean" in p:
            p["mean"] = rng.normal(0, 0.1, p["mean"].shape).astype(np.float32)
            p["var"] = (1.0 + rng.uniform(0, 0.5, p["var"].shape)).astype(np.float32)
        if lname.startswith("scale"):
            p["W"] = (1.0 + rng.normal(0, 0.1, p["W"].shape)).astype(np.float32)
            p["b"] = rng.normal(0, 0.1, p["b"].shape).astype(np.float32)
    return g, params


# Released 2x pruned ResNet-50 structure (channel-count DATA extracted from
# the reference's temp/resnet-50-cp.prototxt; golden-checked by
# tests/test_caffe_io.py). Three tables:
#   * surviving branch2a widths (pruned via branch2b's input selection)
#   * surviving branch2b widths (pruned via branch2c's input selection)
#   * Filter (channel-gate) keep counts in front of each block's branch2a,
#     keyed by that CONSUMER conv (temp/resnet-50-cp.prototxt Filter layers)
RESNET50_2X_BRANCH2A = {
    "res2a_branch2a": 64, "res2b_branch2a": 51, "res2c_branch2a": 50,
    "res3a_branch2a": 128, "res3b_branch2a": 105, "res3c_branch2a": 105,
    "res3d_branch2a": 128,
    "res4a_branch2a": 256, "res4b_branch2a": 209, "res4c_branch2a": 204,
    "res4d_branch2a": 212, "res4e_branch2a": 211, "res4f_branch2a": 256,
    "res5a_branch2a": 512, "res5b_branch2a": 512, "res5c_branch2a": 512,
}

RESNET50_2X_BRANCH2B = {
    "res2a_branch2b": 55, "res2b_branch2b": 39, "res2c_branch2b": 37,
    "res3a_branch2b": 106, "res3b_branch2b": 72, "res3c_branch2b": 72,
    "res3d_branch2b": 110,
    "res4a_branch2b": 225, "res4b_branch2b": 147, "res4c_branch2b": 158,
    "res4d_branch2b": 155, "res4e_branch2b": 148, "res4f_branch2b": 213,
    "res5a_branch2b": 433, "res5b_branch2b": 437, "res5c_branch2b": 440,
}

RESNET50_2X_FILTERS = {
    "res2a_branch2a": 35, "res2b_branch2a": 101, "res2c_branch2a": 97,
    "res3a_branch2a": 144, "res3b_branch2a": 205, "res3c_branch2a": 198,
    "res3d_branch2a": 288,
    "res4a_branch2a": 278, "res4b_branch2a": 418, "res4c_branch2a": 407,
    "res4d_branch2a": 423, "res4e_branch2a": 412, "res4f_branch2a": 595,
    "res5a_branch2a": 606, "res5b_branch2a": 1222, "res5c_branch2a": 1147,
}


def resnet50_2x_targets() -> tuple[dict[str, int], dict[str, int]]:
    """(producer-keyed shrink targets, consumer-keyed input-gate targets)
    reproducing the released 2x structure: shrinking branch2a/branch2b
    outputs to the released widths, gating each block input ahead of
    branch2a with a Select/Filter."""
    prod = dict(RESNET50_2X_BRANCH2A)
    prod.update(RESNET50_2X_BRANCH2B)
    return prod, dict(RESNET50_2X_FILTERS)


# ---------------------------------------------------------------------------
# CIFAR generators (capability parity with the reference's programmatic cifar
# resnet/plain builders, lib/builder.py:888-1022)
# ---------------------------------------------------------------------------

def build_cifar_resnet(n: int = 3, batch: int = 128, num_classes: int = 10,
                       widths=(16, 32, 64), name: str | None = None) -> Graph:
    """The 6n+2 CIFAR ResNet (basic blocks, option-A style with 1x1
    projection shortcuts on stride-2 transitions)."""
    layers: list[Layer] = []
    _conv_bn(layers, "conv1", "data", widths[0], kernel=3, stride=1, pad=1,
             bn_prefix="_conv1", relu=True)
    prev = "conv1"
    for si, width in enumerate(widths):
        for bi in range(n):
            tag = f"{si + 2}{_BLOCK_LETTERS[bi]}"
            block = f"res{tag}"
            stride = 2 if (si > 0 and bi == 0) else 1
            if stride != 1 or (bi == 0 and si > 0):
                shortcut = _conv_bn(layers, f"{block}_branch1", prev, width,
                                    kernel=1, stride=stride, pad=0,
                                    bn_prefix=f"{tag}_branch1", relu=False)
            else:
                shortcut = prev
            a = _conv_bn(layers, f"{block}_branch2a", prev, width, kernel=3,
                         stride=stride, pad=1, bn_prefix=f"{tag}_branch2a",
                         relu=True)
            b = _conv_bn(layers, f"{block}_branch2b", a, width, kernel=3,
                         stride=1, pad=1, bn_prefix=f"{tag}_branch2b",
                         relu=False)
            layers.append(Layer.make(block, LT.ELTWISE, [shortcut, b],
                                     operation="sum"))
            layers.append(Layer.make(f"{block}_relu", LT.RELU, [block], [block]))
            prev = block
    layers.append(Layer.make("global_pool", LT.POOL, [prev], pool="ave",
                             global_pooling=True))
    layers.append(Layer.make("fc", LT.FC, ["global_pool"],
                             num_output=num_classes, bias=True))
    layers.append(Layer.make("prob", LT.SOFTMAX, ["fc"]))
    g = Graph(name=name or f"cifar_resnet{6 * n + 2}",
              inputs=(TensorSpec("data", (batch, 3, 32, 32)),),
              layers=tuple(layers))
    g.validate()
    return g


def build_cifar_plain(n: int = 3, batch: int = 128, num_classes: int = 10,
                      widths=(16, 32, 64), name: str | None = None) -> Graph:
    """The plain (no-shortcut) counterpart (reference `plain` generator,
    lib/builder.py:983-1022)."""
    layers: list[Layer] = []
    _conv_bn(layers, "conv1", "data", widths[0], kernel=3, stride=1, pad=1,
             bn_prefix="_conv1", relu=True)
    prev = "conv1"
    idx = 1
    for si, width in enumerate(widths):
        for bi in range(2 * n):
            idx += 1
            conv = f"conv{idx}"
            stride = 2 if (si > 0 and bi == 0) else 1
            _conv_bn(layers, conv, prev, width, kernel=3, stride=stride,
                     pad=1, bn_prefix=f"_{conv}", relu=True)
            prev = conv
    layers.append(Layer.make("global_pool", LT.POOL, [prev], pool="ave",
                             global_pooling=True))
    layers.append(Layer.make("fc", LT.FC, ["global_pool"],
                             num_output=num_classes, bias=True))
    layers.append(Layer.make("prob", LT.SOFTMAX, ["fc"]))
    g = Graph(name=name or f"cifar_plain{6 * n + 2}",
              inputs=(TensorSpec("data", (batch, 3, 32, 32)),),
              layers=tuple(layers))
    g.validate()
    return g
