"""Rolling activation replay vs full-replay equivalence (sampling/rolling.py).

For chain graphs the O(L) frontier advance must produce exactly the same
patches/features as the O(L^2) full replays, including after asymmetric
weight overwrites."""
import numpy as np
import pytest

from channel_pruning_tpu.graph.rewrite import split_relu
from channel_pruning_tpu.models.vgg import build_tiny_vgg
from channel_pruning_tpu.models.resnet import build_tiny_resnet
from channel_pruning_tpu.ops.forward import to_device_params
from channel_pruning_tpu.sampling import freeze, sample_patches, sample_features
from channel_pruning_tpu.sampling.rolling import (RollingReplay,
                                                  estimate_peak_bytes, is_chain)


@pytest.fixture(scope="module")
def setup():
    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(3)
    inputs = rng.normal(0, 1, (6, 4, 3, 16, 16)).astype(np.float32)
    dev = to_device_params(params)
    cache = freeze(g, dev, inputs, n_points=5, seed=0, chunk_batches=3)
    return g, params, dev, inputs, cache


def test_is_chain():
    g, _ = build_tiny_vgg(batch=2, image_size=16)
    assert is_chain(split_relu(g))
    gr, _ = build_tiny_resnet(batch=2, image_size=32)
    assert not is_chain(gr)
    assert estimate_peak_bytes(g, 500) > 0


def test_rolling_patches_match_full_replay(setup):
    g, params, dev, inputs, cache = setup
    roll = RollingReplay(g, inputs)
    for conv in list(g.convs)[1:]:
        bottom = g.layer(conv).bottoms[0]
        roll.advance_to(dev, bottom)
        Xr = roll.patches_at(cache.plan, conv)
        Xf = sample_patches(g, dev, inputs, conv, cache.plan, chunk_batches=3)
        np.testing.assert_allclose(Xr, Xf, rtol=1e-4, atol=1e-5)


def test_rolling_respects_weight_updates(setup):
    """After overwriting a mid-layer's weights, frontier advance past that
    layer must reflect the update (asymmetric accumulation contract)."""
    g, params, dev, inputs, cache = setup
    p2 = {k: dict(v) for k, v in params.items()}
    p2["conv2_1"]["W"] = (np.asarray(p2["conv2_1"]["W"]) * 0.5)
    dev2 = to_device_params(p2)

    roll = RollingReplay(g, inputs)
    roll.advance_to(dev2, g.layer("conv2_2").bottoms[0])
    Xr = roll.patches_at(cache.plan, "conv2_2")
    Xf = sample_patches(g, dev2, inputs, "conv2_2", cache.plan, chunk_batches=3)
    np.testing.assert_allclose(Xr, Xf, rtol=1e-4, atol=1e-5)


def test_rolling_features_at(setup):
    g, params, dev, inputs, cache = setup
    conv = "conv2_2"
    top = g.layer(conv).tops[0]
    roll = RollingReplay(g, inputs)
    roll.advance_to(dev, g.layer(conv).bottoms[0])
    got = roll.features_at(dev, cache.plan, top)
    want = sample_features(g, dev, inputs, cache.plan, (top,),
                           chunk_batches=3)[top]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dag_rolling_matches_full_replay():
    """DAG-cut frontier must reproduce full-replay patches for a residual
    net, including through Eltwise junctions and weight updates."""
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling.rolling import (RollingReplayDAG,
                                                      estimate_cut_bytes)
    from channel_pruning_tpu.sampling.sampler import resnet_share_key

    g0, p0 = build_tiny_resnet(batch=4, image_size=32)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(4)
    inputs = rng.normal(0, 1, (6, 4, 3, 32, 32)).astype(np.float32)
    dev = to_device_params(p)
    cache = freeze(g, dev, inputs, n_points=4, seed=0, chunk_batches=3,
                   share_key=resnet_share_key(g))
    assert estimate_cut_bytes(g, 24) > 0
    roll = RollingReplayDAG(g, inputs, group_batches=3)
    for conv in list(g.convs)[1:6]:
        bottom = g.layer(conv).bottoms[0]
        roll.advance_to(dev, bottom)
        Xr = roll.patches_at(cache.plan, conv)
        Xf = sample_patches(g, dev, inputs, conv, cache.plan, chunk_batches=3)
        np.testing.assert_allclose(Xr, Xf, rtol=1e-4, atol=1e-5)
    # features of a shortcut tensor straight from the cut
    from channel_pruning_tpu.graph.ir import LT
    e = g.by_type(LT.ELTWISE)[0]
    sc = e.bottoms[0]
    roll2 = RollingReplayDAG(g, inputs, group_batches=3)
    roll2.advance_to(dev, g.layer(e.bottoms[1]).bottoms[0]
                     if g.producer(e.bottoms[1]).type == LT.CONV else sc)
    got = roll2.features_at(dev, cache.plan, sc)
    want = sample_features(g, dev, inputs, cache.plan, (sc,),
                           chunk_batches=3)[sc]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frontier_error_is_narrow(setup):
    """Rewinds raise FrontierError (the ONLY exception the solve loop treats
    as a fall-back signal); anything else must propagate as a bug."""
    from channel_pruning_tpu.sampling.rolling import (FrontierError,
                                                      RollingReplayDAG)

    g, params, dev, inputs, cache = setup
    roll = RollingReplay(g, inputs)
    convs = list(g.convs)
    roll.advance_to(dev, g.layer(convs[2]).bottoms[0])
    with pytest.raises(FrontierError):
        roll.advance_to(dev, g.layer(convs[1]).bottoms[0])
    with pytest.raises(FrontierError):
        roll.patches_at(cache.plan, convs[1])

    g0, p0 = build_tiny_resnet(batch=4, image_size=32)
    from channel_pruning_tpu.pipeline import c3
    gr, pr = c3.preprocess(g0, p0)
    rng = np.random.default_rng(7)
    rin = rng.normal(0, 1, (3, 4, 3, 32, 32)).astype(np.float32)
    devr = to_device_params(pr)
    rconvs = list(gr.convs)
    dag = RollingReplayDAG(gr, rin, group_batches=3)
    dag.advance_to(devr, gr.layer(rconvs[3]).bottoms[0])
    with pytest.raises(FrontierError):
        dag.advance_to(devr, gr.layer(rconvs[1]).bottoms[0])


@pytest.mark.slow
def test_resnet_solve_uses_dag_rolling_equivalently():
    """tiny-resnet solve_prune (now on the DAG frontier) must agree with
    the full-replay path layer for layer."""
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling.sampler import resnet_share_key
    from channel_pruning_tpu.utils.config import default_config

    g0, p0 = build_tiny_resnet(batch=4, image_size=32)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(5)
    inputs = rng.normal(0, 1, (4, 4, 3, 32, 32)).astype(np.float32)
    cache = freeze(g, to_device_params(p), inputs, n_points=6, seed=0,
                   chunk_batches=2, share_key=resnet_share_key(g))
    targets = {c: max(2, int(int(g.layer(c).attr("num_output")) * 0.7))
               for c in g.convs if c.endswith("branch2b")}
    cfg = default_config()
    res_roll = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                              verbose=False)
    res_full = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                              verbose=False)
    # determinism check first (same path twice)
    import channel_pruning_tpu.pipeline.c3 as c3mod
    orig = c3mod._maybe_rolling
    c3mod._maybe_rolling = lambda *a, **k: None
    try:
        res_none = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                                  verbose=False)
    finally:
        c3mod._maybe_rolling = orig
    for k in res_roll.selections:
        np.testing.assert_array_equal(res_roll.selections[k],
                                      res_none.selections[k])
