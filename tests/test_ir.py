import numpy as np
import pytest

from channel_pruning_tpu.graph.ir import Graph, Layer, LT, TensorSpec, shapes_of
from channel_pruning_tpu.models.vgg import build_vgg16, build_tiny_vgg
from channel_pruning_tpu.models.resnet import build_resnet50, build_tiny_resnet


def test_vgg16_structure():
    g = build_vgg16()
    assert len(g.convs) == 13
    assert len(g.pools) == 5
    assert len(g.fcs) == 3
    assert g.convs[0] == "conv1_1" and g.convs[-1] == "conv5_3"
    g.validate()


def test_vgg16_shapes():
    g = build_vgg16(batch=2)
    shapes = shapes_of(g)
    assert shapes["conv1_1"] == (2, 64, 224, 224)
    assert shapes["pool1"] == (2, 64, 112, 112)
    assert shapes["pool5"] == (2, 512, 7, 7)
    assert shapes["fc8"] == (2, 1000)


def test_resnet50_structure_and_shapes():
    g = build_resnet50(batch=2)
    assert len(g.convs) == 53  # 1 stem + 16*3 bottleneck + 4 projection
    shapes = shapes_of(g)
    assert shapes["conv1"] == (2, 64, 112, 112)
    # Caffe ceil-mode pooling: 112 -> 56 (not 55)
    assert shapes["pool1"] == (2, 64, 56, 56)
    assert shapes["res2a"] == (2, 256, 56, 56)
    assert shapes["res5c"] == (2, 2048, 7, 7)
    assert shapes["pool5"] == (2, 2048, 1, 1)
    assert shapes["fc1000"] == (2, 1000)


def test_graph_hashable_and_immutable():
    g = build_tiny_vgg()[0]
    hash(g)  # usable as a jit static argument
    g2 = g.replace_layer("conv1_1", g.layer("conv1_1").with_attrs(num_output=99))
    assert g.layer("conv1_1").attr("num_output") != 99
    assert g2.layer("conv1_1").attr("num_output") == 99


def test_producer_consumer_inplace():
    g = build_tiny_vgg()[0]
    # relu1_1 is in-place on conv1_1's top
    p = g.producer("conv1_1")
    assert p.name == "relu1_1"  # last writer
    pb = g.producer_before("conv1_1", "relu1_1")
    assert pb.name == "conv1_1"
    consumers = g.consumers("conv1_1")
    assert {c.name for c in consumers} >= {"relu1_1", "conv1_2"}


def test_validate_rejects_dangling():
    bad = Graph("bad", (TensorSpec("data", (1, 3, 4, 4)),),
                (Layer.make("c", LT.CONV, ["nope"], num_output=1, kernel_size=1),))
    with pytest.raises(ValueError):
        bad.validate()


def test_outputs():
    g = build_tiny_vgg()[0]
    assert g.outputs() == ("prob",)


def test_add_bn_preserves_function():
    """BN restoration (reference add_bn, net.py:1001-1047): inserting
    measured-stats BN + (std, mean) Scale after each conv must leave the
    net's function unchanged."""
    import numpy as np

    from channel_pruning_tpu.graph.rewrite import add_bn_after_convs, split_relu
    from channel_pruning_tpu.models.vgg import build_tiny_vgg
    from channel_pruning_tpu.ops.forward import build_forward, to_device_params
    from channel_pruning_tpu.sampling.sampler import channel_stats

    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(0)
    inputs = rng.normal(0, 1, (2, 4, 3, 16, 16)).astype(np.float32)
    tops = {c: g.layer(c).tops[0] for c in g.convs}
    stats_by_top = channel_stats(g, to_device_params(params), inputs,
                                 tuple(tops.values()), chunk_batches=2)
    stats = {c: stats_by_top[t] for c, t in tops.items()}
    g2, p2 = add_bn_after_convs(g, params, stats)
    assert len(g2.bns) == len(g.convs)
    x = inputs[0]
    o1, _ = build_forward(g, jit=False)(to_device_params(params), {"data": x})
    o2, _ = build_forward(g2, jit=False)(to_device_params(p2), {"data": x})
    np.testing.assert_allclose(np.asarray(o1["prob"]), np.asarray(o2["prob"]),
                               rtol=1e-3, atol=1e-5)


def test_ancestors_subgraph_minimal():
    from channel_pruning_tpu.models.resnet import build_tiny_resnet

    g, _ = build_tiny_resnet(batch=2, image_size=32)
    sub = g.ancestors_subgraph(("res2a_branch2b",))
    assert sub.has_layer("res2a_branch2a")
    assert not sub.has_layer("res3a_branch2a")
    assert not sub.has_layer("fc1000")
    # a shortcut-only tensor outside the branch path is dropped too
    assert not sub.has_layer("res2a_branch2c")
