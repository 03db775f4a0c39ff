"""Xception graph builder (depthwise-separable conv family).

The reference lists Xception among its supported model families
(lib/cfgs.py:56-60 Models registry; README.md "Xception") but ships no
prototxt for it; capability parity means the pipeline must handle
depthwise-separable topologies — depthwise convs map to `group == channels`
(Caffe convolution_param.group; executed via feature_group_count in
ops/forward.py). Architecture follows the Xception paper's entry/middle/exit
flows with BN after every conv.
"""
from __future__ import annotations

import numpy as np

from channel_pruning_tpu.graph.ir import Graph, Layer, LT, TensorSpec


def _conv_bn_relu(layers, name, bottom, num_output, kernel, stride=1, pad=None,
                  group=1, relu=True):
    if pad is None:
        pad = kernel // 2
    layers.append(Layer.make(name, LT.CONV, [bottom], num_output=num_output,
                             kernel_size=kernel, stride=stride, pad=pad,
                             group=group, bias=False))
    layers.append(Layer.make(f"{name}_bn", LT.BN, [name], [name], eps=1e-5))
    layers.append(Layer.make(f"{name}_scale", LT.SCALE, [name], [name], bias=True))
    if relu:
        layers.append(Layer.make(f"{name}_relu", LT.RELU, [name], [name]))
    return name


def _sep_conv(layers, name, bottom, in_ch, out_ch, relu_first=False):
    """Depthwise 3x3 (group = in channels) + pointwise 1x1."""
    if relu_first:
        layers.append(Layer.make(f"{name}_prerelu", LT.RELU, [bottom],
                                 [f"{name}_prerelu"]))
        bottom = f"{name}_prerelu"
    _conv_bn_relu(layers, f"{name}_dw", bottom, in_ch, kernel=3, group=in_ch,
                  relu=False)
    _conv_bn_relu(layers, f"{name}_pw", f"{name}_dw", out_ch, kernel=1,
                  relu=False)
    return f"{name}_pw"


def build_xception(batch: int = 10, image_size: int = 224,
                   num_classes: int = 1000, middle_blocks: int = 8,
                   width: float = 1.0, name: str = "xception") -> Graph:
    def w(c):
        return max(8, int(c * width))

    layers: list[Layer] = []
    prev = _conv_bn_relu(layers, "conv1", "data", w(32), kernel=3, stride=2, pad=1)
    prev = _conv_bn_relu(layers, "conv2", prev, w(64), kernel=3)

    # entry flow: 3 strided residual blocks
    ch = w(64)
    for i, out_ch in enumerate((w(128), w(256), w(728)), start=1):
        blk = f"entry{i}"
        sc = _conv_bn_relu(layers, f"{blk}_shortcut", prev, out_ch, kernel=1,
                           stride=2, pad=0, relu=False)
        t = _sep_conv(layers, f"{blk}_sep1", prev, ch, out_ch,
                      relu_first=(i > 1))
        t = _sep_conv(layers, f"{blk}_sep2", t, out_ch, out_ch, relu_first=True)
        layers.append(Layer.make(f"{blk}_pool", LT.POOL, [t], pool="max",
                                 kernel_size=3, stride=2, pad=1,
                                 ceil_mode=False))
        layers.append(Layer.make(blk, LT.ELTWISE, [sc, f"{blk}_pool"],
                                 operation="sum"))
        prev, ch = blk, out_ch

    # middle flow: residual triple-separable blocks
    for i in range(1, middle_blocks + 1):
        blk = f"mid{i}"
        t = prev
        for j in (1, 2, 3):
            t = _sep_conv(layers, f"{blk}_sep{j}", t, ch, ch, relu_first=True)
        layers.append(Layer.make(blk, LT.ELTWISE, [prev, t], operation="sum"))
        prev = blk

    # exit flow
    sc = _conv_bn_relu(layers, "exit_shortcut", prev, w(1024), kernel=1,
                       stride=2, pad=0, relu=False)
    t = _sep_conv(layers, "exit_sep1", prev, ch, w(728), relu_first=True)
    t = _sep_conv(layers, "exit_sep2", t, w(728), w(1024), relu_first=True)
    layers.append(Layer.make("exit_pool", LT.POOL, [t], pool="max",
                             kernel_size=3, stride=2, pad=1, ceil_mode=False))
    layers.append(Layer.make("exit", LT.ELTWISE, [sc, "exit_pool"],
                             operation="sum"))
    t = _sep_conv(layers, "exit_sep3", "exit", w(1024), w(1536))
    layers.append(Layer.make("exit_sep3_relu", LT.RELU, [t], [t]))
    t = _sep_conv(layers, "exit_sep4", t, w(1536), w(2048))
    layers.append(Layer.make("exit_sep4_relu", LT.RELU, [t], [t]))
    layers.append(Layer.make("global_pool", LT.POOL, [t], pool="ave",
                             global_pooling=True))
    layers.append(Layer.make("fc", LT.FC, ["global_pool"],
                             num_output=num_classes, bias=True))
    layers.append(Layer.make("prob", LT.SOFTMAX, ["fc"]))

    g = Graph(name=name,
              inputs=(TensorSpec("data", (batch, 3, image_size, image_size)),),
              layers=tuple(layers))
    g.validate()
    return g


def build_tiny_xception(batch: int = 4, image_size: int = 32,
                        num_classes: int = 10, seed: int = 0):
    from channel_pruning_tpu.models.vgg import init_params

    g = build_xception(batch=batch, image_size=image_size,
                       num_classes=num_classes, middle_blocks=2, width=0.125,
                       name="tiny_xception")
    params = init_params(g, seed=seed)
    rng = np.random.default_rng(seed + 1)
    for lname, p in params.items():
        if "mean" in p:
            p["mean"] = rng.normal(0, 0.05, p["mean"].shape).astype(np.float32)
            p["var"] = (1.0 + rng.uniform(0, 0.2, p["var"].shape)).astype(np.float32)
    return g, params
