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
