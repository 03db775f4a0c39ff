"""Model-family builders: every registry entry must build, validate, shape-
infer, and (for the tiny variants) run forward + survive the prune pipeline.
Covers the reference's model surface: VGG, ResNet-50, Xception, Faster-RCNN
backbone, CIFAR generators (lib/cfgs.py:56-66, lib/builder.py:888-1022)."""
import numpy as np
import pytest

from channel_pruning_tpu.graph.ir import LT, shapes_of
from channel_pruning_tpu.models import zoo
from channel_pruning_tpu.models.faster_rcnn import build_tiny_frcnn
from channel_pruning_tpu.models.resnet import build_cifar_plain, build_cifar_resnet
from channel_pruning_tpu.models.vgg import init_params
from channel_pruning_tpu.models.xception import build_tiny_xception
from channel_pruning_tpu.ops.forward import build_forward, to_device_params


@pytest.mark.parametrize("name,kw", [
    ("vgg16", {"batch": 1}),
    ("resnet50", {"batch": 1}),
    ("xception", {"batch": 1}),
    ("frcnn_vgg16", {"batch": 1, "image_size": 224}),
    ("cifar_resnet20", {"batch": 2}),
    ("cifar_plain20", {"batch": 2}),
])
def test_registry_builds_and_shapes(name, kw):
    g = zoo.get_model(name, **kw)
    g.validate()
    shapes = shapes_of(g)
    for l in g.layers:
        for t in l.tops:
            assert t in shapes


def test_xception_forward_runs():
    g, params = build_tiny_xception(batch=2, image_size=32)
    x = np.random.default_rng(0).normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    outs, _ = build_forward(g, jit=False)(to_device_params(params), {"data": x})
    p = np.asarray(outs["prob"])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)
    # depthwise convs present (group == channels)
    dws = [l for l in g.by_type(LT.CONV) if l.conv_geometry()["group"] > 1]
    assert dws, "expected depthwise convolutions"


def test_frcnn_backbone_outputs():
    g, params = build_tiny_frcnn(batch=1, image_size=48)
    shapes = shapes_of(g)
    # rpn heads at 1/(2^(stages-1)) resolution; both heads present
    assert shapes[g.layer("rpn_cls_score").tops[0]][1] == 2 * 3
    assert shapes[g.layer("rpn_bbox_pred").tops[0]][1] == 4 * 3
    x = np.random.default_rng(0).normal(0, 1, (1, 3, 48, 48)).astype(np.float32)
    outs, caps = build_forward(g, capture=("rpn/output",), jit=False)(
        to_device_params(params), {"data": x})
    assert caps["rpn/output"].shape[1] == 512


def test_cifar_resnet_structure():
    g = build_cifar_resnet(n=3, batch=2)
    assert len(g.convs) == 1 + 3 * 3 * 2 + 2  # stem + 18 block convs + 2 proj
    shapes = shapes_of(g)
    assert shapes[g.layer("fc").tops[0]] == (2, 10)
    gp = build_cifar_plain(n=3, batch=2)
    assert len(gp.convs) == 1 + 18


def test_plan_uniform_targets_hits_ratio():
    """The structure-aware planner's own simulation must hit the asked
    conv-mult ratio on a gate-heavy topology (VERDICT r1 #8)."""
    import io
    from contextlib import redirect_stdout

    from channel_pruning_tpu.pipeline import c3

    g0, p0 = build_tiny_xception(batch=1, image_size=32)
    g, _ = c3.preprocess(g0, p0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        targets = c3.plan_uniform_targets(g, 2.0)
    out = buf.getvalue()
    assert "predicted" in out
    pred = float(out.split("predicted")[1].split("x")[0])
    assert 1.9 <= pred <= 2.3, out
    # planner keeps must be strictly tighter than the naive 1/sqrt(2)
    naive = c3.prune_targets_from_ratio(g, 2.0)
    assert sum(targets.values()) < sum(naive[k] for k in targets)


@pytest.mark.slow
def test_xception_depthwise_joint_shrink():
    """channel_targets on a depthwise producer physically shrink the dw conv
    (rows + group) AND its upstream pointwise conv — not just a gate
    (VERDICT r1 #8: lift Xception beyond gate-only pruning)."""
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.sampling.sampler import resnet_share_key
    from channel_pruning_tpu.utils.config import default_config
    from channel_pruning_tpu.utils import flops

    g0, p0 = build_tiny_xception(batch=2, image_size=32)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(4)
    inputs = rng.normal(0, 1, (4, 2, 3, 32, 32)).astype(np.float32)
    cache = freeze(g, to_device_params(p), inputs, n_points=6, seed=0,
                   chunk_batches=2, share_key=resnet_share_key(g))
    # sep1's dw reads the residual tensor (also feeds the Eltwise), so only
    # sep2/sep3 have a fully-shrinkable dw->pw chain
    targets = {}
    for conv in g.convs:
        if "mid" in conv and conv.endswith("_dw") and "_sep1" not in conv:
            n_out = int(g.layer(conv).attr("num_output"))
            targets[conv] = max(2, int(n_out * 0.6))
    assert targets
    res = c3.solve_prune(g, p, cache, default_config(),
                         channel_targets=targets, verbose=False)
    res.graph.validate()
    from channel_pruning_tpu.graph.ir import LT
    assert not res.graph.by_type(LT.SELECT), \
        "joint shrink must not fall back to gates in the mid blocks"
    for dw, t in targets.items():
        geo = res.graph.layer(dw).conv_geometry()
        kept = int(res.graph.layer(dw).attr("num_output"))
        assert kept < int(g.layer(dw).attr("num_output"))
        assert geo["group"] == kept                     # still depthwise
        assert res.params[dw]["W"].shape[0] == kept
        # upstream pointwise produced fewer channels too
        from channel_pruning_tpu.pipeline.prune import producer_conv
        up = producer_conv(res.graph, res.graph.layer(dw).bottoms[0], before=dw)
        if up is not None:
            assert res.params[up]["W"].shape[0] == kept
    assert flops.total_flops(res.graph) < flops.total_flops(g)
    x = inputs[0]
    outs, _ = build_forward(res.graph, jit=False)(
        to_device_params(res.params), {"data": x})
    np.testing.assert_allclose(np.asarray(outs["prob"]).sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_xception_prunes_pointwise():
    """Depthwise-separable nets go through the prune pipeline: pointwise
    conv inputs are prunable like any conv."""
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.sampling.sampler import resnet_share_key
    from channel_pruning_tpu.utils.config import default_config

    g0, p0 = build_tiny_xception(batch=2, image_size=32)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(3)
    inputs = rng.normal(0, 1, (4, 2, 3, 32, 32)).astype(np.float32)
    cache = freeze(g, to_device_params(p), inputs, n_points=6, seed=0,
                   chunk_batches=2, share_key=resnet_share_key(g))
    # prune the mid-block pointwise convs' inputs via gates (producers are
    # depthwise convs whose outputs can't shrink independently)
    targets = {}
    for conv in g.convs:
        if "mid" in conv and conv.endswith("_pw"):
            w = p[conv]["W"]
            targets[conv] = max(2, int(w.shape[1] * 0.7))
    assert targets
    res = c3.solve_prune(g, p, cache, default_config(), input_targets=targets,
                         verbose=False)
    res.graph.validate()
    for conv, t in targets.items():
        keep = res.selections[conv]
        assert res.params[conv]["W"].shape[1] == keep.sum()
    x = inputs[0]
    outs, _ = build_forward(res.graph, jit=False)(
        to_device_params(res.params), {"data": x})
    np.testing.assert_allclose(np.asarray(outs["prob"]).sum(-1), 1.0, rtol=1e-4)
