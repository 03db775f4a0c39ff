"""Planner-vs-pruner agreement across all five model families.

`plan_uniform_targets` predicts the post-prune conv-mult ratio by SIMULATING
`apply_pruning`'s shrink rules (which producers physically shrink vs gate-only
junctions, depthwise pass-through, top-of-band support outcome). If the two
drift, the planner silently mis-predicts the ratio — this pins
simulate() == apply() on a tiny graph of every family the reference supports
(lib/cfgs.py:56-60; accounting contract tools.py:36-46 calflop.sh).
"""
import numpy as np
import pytest

from channel_pruning_tpu.pipeline import c3
from channel_pruning_tpu.sampling import freeze
from channel_pruning_tpu.sampling.sampler import resnet_share_key
from channel_pruning_tpu.ops.forward import to_device_params
from channel_pruning_tpu.utils import flops
from channel_pruning_tpu.utils.config import default_config


def _tiny(name):
    if name == "vgg":
        from channel_pruning_tpu.models.vgg import build_tiny_vgg
        return build_tiny_vgg(batch=4, image_size=16)
    if name == "resnet":
        from channel_pruning_tpu.models.resnet import build_tiny_resnet
        return build_tiny_resnet(batch=4, image_size=32)
    if name == "xception":
        from channel_pruning_tpu.models.xception import build_tiny_xception
        return build_tiny_xception(batch=4, image_size=32)
    if name == "frcnn":
        from channel_pruning_tpu.models.faster_rcnn import build_tiny_frcnn
        return build_tiny_frcnn(batch=2, image_size=48)
    if name == "cifar":
        from channel_pruning_tpu.models.resnet import build_cifar_resnet
        from channel_pruning_tpu.models.vgg import init_params
        g = build_cifar_resnet(n=1, batch=2, widths=(16, 32, 32))
        return g, init_params(g, seed=0)
    raise KeyError(name)


@pytest.mark.parametrize("family,speed", [
    ("vgg", 2.0), ("resnet", 1.5), ("xception", 1.5),
    ("frcnn", 2.0), ("cifar", 1.5),
])
@pytest.mark.slow
def test_planner_matches_measured_ratio(family, speed):
    g0, p0 = _tiny(family)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(3)
    shape = g.inputs[0].shape
    inputs = rng.normal(0, 1, (6,) + tuple(shape)).astype(np.float32)
    cfg = default_config()
    share = resnet_share_key(g) if g.sums else None
    cache = freeze(g, to_device_params(p), inputs, n_points=4, seed=0,
                   chunk_batches=3, share_key=share)
    targets, predicted = c3.plan_uniform_targets(g, speed,
                                                 rank_tol=cfg.dic.rank_tol,
                                                 with_prediction=True)
    res = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                         verbose=False)
    res.graph.validate()
    orig = flops.total_flops(g, include_fc=False)
    new = flops.total_flops(res.graph, include_fc=False)
    measured = orig / max(new, 1)
    # tiny-channel discretisation (8-32 wide convs) makes individual
    # support-band landings coarse; at production scale the measured
    # agreement is 5.00 predicted -> 5.05 measured (BENCH_NOTES frcnn)
    assert abs(measured - predicted) / predicted < 0.08, (
        family, predicted, measured)


def test_what_if_flops_scales_matching_convs():
    """what_if_flops (reference rescomputation / tools.py resnet what-if)
    scales only matching convs' output counts by keep."""
    from channel_pruning_tpu.models.resnet import build_tiny_resnet
    from channel_pruning_tpu.utils import flops

    g, _ = build_tiny_resnet(batch=1, image_size=32)
    full = flops.total_flops(g, include_fc=False)
    half = flops.what_if_flops(g, 0.5, match="branch2a")
    shapes_full = flops.total_flops(g, include_fc=False, verbose=False)
    assert half < full == shapes_full
    # the delta equals exactly half the branch2a contribution
    from channel_pruning_tpu.graph.ir import LT, shapes_of
    shapes = shapes_of(g, batch=1)
    b2a = sum(flops.layer_flops(g, shapes, l.name) for l in g.layers
              if l.type == LT.CONV and "branch2a" in l.name)
    assert b2a > 0
    assert abs((full - half) - b2a // 2) <= len(g.convs)  # int rounding
