"""VGG-16 graph builder (structure parity with the reference's
temp/vgg.prototxt eval graph: 13 convs / 5 pools / 3 FCs, 3x3 pad-1 convs,
2x2 stride-2 max pools, ReLU after every conv/fc, dropout on fc6/fc7)."""
from __future__ import annotations

import numpy as np

from channel_pruning_tpu.graph.ir import Graph, Layer, LT, TensorSpec

# (stage, blocks, channels)
VGG16_CFG = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))

# Per-layer spatial-decomposition ranks for the 3C pipeline at 4x
# (reference: rankdic, lib/net.py:1309-1321; conv5 ranks are not rescaled
# with the speed ratio, lib/net.py:1323-1326).
VGG16_RANKS_4X = {
    "conv1_1": 17, "conv1_2": 17,
    "conv2_1": 37, "conv2_2": 47,
    "conv3_1": 83, "conv3_2": 89, "conv3_3": 106,
    "conv4_1": 175, "conv4_2": 192, "conv4_3": 227,
    "conv5_1": 398, "conv5_2": 390, "conv5_3": 379,
}

# Channel counts of the released 5x pruning-only model
# (temp/channel_pruning.prototxt num_output sequence) used as a golden
# target for the pruning-only pipeline preset.
VGG16_5X_CHANNELS = {
    "conv1_1": 24, "conv1_2": 22,
    "conv2_1": 41, "conv2_2": 51,
    "conv3_1": 108, "conv3_2": 89, "conv3_3": 111,
    "conv4_1": 184, "conv4_2": 276, "conv4_3": 228,
    "conv5_1": 512, "conv5_2": 512, "conv5_3": 512,
}

VGG16_FLOPS = 15_346_630_656  # original multiply count (lib/cfgs.py:66)


def build_vgg16(batch: int = 10, image_size: int = 224, num_classes: int = 1000,
                cfg=VGG16_CFG, fc_dims=(4096, 4096), inplace_relu: bool = True,
                name: str = "vgg16") -> Graph:
    """Build the VGG-16 inference graph.

    `inplace_relu=True` mirrors the stock prototxt (relu tops alias conv
    tops); the pipeline later splits them (rewrite.split_relu) so conv
    outputs are addressable for sampling — reference seperateConvReLU
    (lib/net.py:1228-1256).
    """
    layers: list[Layer] = []
    prev = "data"
    for stage, blocks, ch in cfg:
        for b in range(1, blocks + 1):
            conv = f"conv{stage}_{b}"
            layers.append(Layer.make(conv, LT.CONV, [prev], num_output=ch,
                                     kernel_size=3, pad=1, stride=1, bias=True))
            relu_top = conv if inplace_relu else f"relu{stage}_{b}"
            layers.append(Layer.make(f"relu{stage}_{b}", LT.RELU, [conv], [relu_top]))
            prev = relu_top
        pool = f"pool{stage}"
        layers.append(Layer.make(pool, LT.POOL, [prev], pool="max",
                                 kernel_size=2, stride=2))
        prev = pool

    for i, dim in enumerate(fc_dims, start=6):
        fc = f"fc{i}"
        layers.append(Layer.make(fc, LT.FC, [prev], num_output=dim, bias=True))
        layers.append(Layer.make(f"relu{i}", LT.RELU, [fc], [fc]))
        layers.append(Layer.make(f"drop{i}", LT.DROPOUT, [fc], [fc], dropout_ratio=0.5))
        prev = fc
    layers.append(Layer.make("fc8", LT.FC, [prev], num_output=num_classes, bias=True))
    layers.append(Layer.make("prob", LT.SOFTMAX, ["fc8"]))

    g = Graph(name=name,
              inputs=(TensorSpec("data", (batch, 3, image_size, image_size)),),
              layers=tuple(layers))
    g.validate()
    return g


def build_tiny_vgg(batch: int = 4, image_size: int = 16, num_classes: int = 10,
                   seed: int = 0):
    """A miniature VGG for CPU tests: same topology class, tiny dims."""
    cfg = ((1, 2, 8), (2, 2, 12), (3, 2, 16))
    g = build_vgg16(batch=batch, image_size=image_size, num_classes=num_classes,
                    cfg=cfg, fc_dims=(32,), name="tiny_vgg")
    params = init_params(g, seed=seed)
    return g, params


def build_digits_vgg(batch: int = 32, image_size: int = 32,
                     num_classes: int = 10, **_ignored) -> Graph:
    """A small but real VGG-style net for the accuracy-recovery loop on the
    bundled digits imagefolder (tools/make_digits_dataset.py): 6 prunable
    3x3 convs in three stages, trained from scratch with this repo's own
    finetune loop — the miniature analogue of the reference's train ->
    prune -> finetune -> eval acceptance chain (README.md:91-100)."""
    cfg = ((1, 2, 32), (2, 2, 64), (3, 2, 128))
    g = build_vgg16(batch=batch, image_size=image_size,
                    num_classes=num_classes, cfg=cfg, fc_dims=(256,),
                    name="digits_vgg")
    # From-scratch training on Caffe-convention inputs (raw BGR pixels minus
    # the mean, ~±120) needs an input scale or the He-init logits overflow
    # f32 softmax; Caffe expresses this as transform_param.scale — here it is
    # an in-graph SCALE layer so the convention travels with the artifacts
    # through prune/finetune/eval round-trips.
    scale = Layer.make("data_scale", LT.SCALE, ["data"], ["data_scaled"],
                       bias=True, init_scale=1.0 / 128.0)
    conv1 = g.layer("conv1_1").with_bottoms(["data_scaled"])
    layers = (scale,) + tuple(
        conv1 if l.name == "conv1_1" else l for l in g.layers)
    g = Graph(name=g.name, inputs=g.inputs, layers=layers)
    g.validate()
    return g


def init_params(graph: Graph, seed: int = 0, dtype=np.float32) -> dict:
    """He-init parameters for every parameterised layer, Caffe layout:
    conv W (O, I/g, kh, kw); fc W (O, I); bias (O,)."""
    from channel_pruning_tpu.graph.ir import shapes_of

    rng = np.random.default_rng(seed)
    shapes = shapes_of(graph)
    params: dict[str, dict[str, np.ndarray]] = {}
    for l in graph.layers:
        if l.type == LT.CONV:
            geo = l.conv_geometry()
            cin = shapes[l.bottoms[0]][1] // geo["group"]
            cout = int(l.attr("num_output"))
            fan_in = cin * geo["kh"] * geo["kw"]
            w = rng.normal(0, (2.0 / fan_in) ** 0.5,
                           (cout, cin, geo["kh"], geo["kw"])).astype(dtype)
            params[l.name] = {"W": w, "b": np.zeros(cout, dtype)}
        elif l.type == LT.FC:
            shp = shapes[l.bottoms[0]]
            fan_in = int(np.prod(shp[1:]))
            cout = int(l.attr("num_output"))
            w = rng.normal(0, (2.0 / fan_in) ** 0.5, (cout, fan_in)).astype(dtype)
            params[l.name] = {"W": w, "b": np.zeros(cout, dtype)}
        elif l.type == LT.BN:
            c = shapes[l.bottoms[0]][1]
            params[l.name] = {"mean": np.zeros(c, dtype), "var": np.ones(c, dtype),
                              "factor": np.ones((), dtype)}
        elif l.type == LT.SCALE:
            c = shapes[l.bottoms[0]][1]
            init = float(l.attr("init_scale", 1.0))
            params[l.name] = {"W": np.full(c, init, dtype),
                              "b": np.zeros(c, dtype)}
    return params
