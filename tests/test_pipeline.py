"""Whole-model pipeline tests on the tiny VGG: pruning-only and full 3C.

These exercise the reference call stack (train.py c3 -> step0/step1/solve,
SURVEY.md §3.1) end to end: preprocess -> freeze -> sequential solve with
asymmetric accumulation -> physically rewritten output graph -> forward.
"""
import numpy as np
import pytest

from channel_pruning_tpu.graph.rewrite import split_relu
from channel_pruning_tpu.models.vgg import build_tiny_vgg
from channel_pruning_tpu.ops.forward import build_forward, to_device_params
from channel_pruning_tpu.pipeline import c3
from channel_pruning_tpu.sampling import freeze
from channel_pruning_tpu.utils import flops
from channel_pruning_tpu.utils.config import default_config


@pytest.fixture(scope="module")
def setup():
    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(7)
    inputs = rng.normal(0, 1, (8, 4, 3, 16, 16)).astype(np.float32)
    cfg = default_config()
    cache = freeze(g, to_device_params(params), inputs, n_points=10,
                   seed=0, chunk_batches=4)
    return g, params, inputs, cfg, cache


def _final_probs(graph, params, x):
    fwd = build_forward(graph, capture=("prob",), jit=False)
    _, caps = fwd(to_device_params(params), {"data": x})
    return np.asarray(caps["prob"])


def test_solve_prune_end_to_end(setup):
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6, "conv2_1": 8, "conv2_2": 9,
               "conv3_1": 10}
    res = c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                         verbose=False)
    res.graph.validate()
    # producer output widths physically pruned to the targets (within band)
    for prod, t in targets.items():
        got = res.params[prod]["W"].shape[0]
        assert t <= got <= t + max(1, int(cfg.dic.rank_tol * t) + 1), (prod, got)
    # consumers consume exactly the kept channels
    for consumer, keep in res.selections.items():
        assert res.params[consumer]["W"].shape[1] == keep.sum()
    # FLOPs strictly reduced
    assert flops.total_flops(res.graph, include_fc=False) < \
        flops.total_flops(g, include_fc=False)
    # pruned net still computes normalised probabilities
    p = _final_probs(res.graph, res.params, inputs[0])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)
    # discriminative bar: LASSO select + lstsq reconstruction must beat a
    # magnitude-prune / no-reconstruction baseline on final logits
    # (the reference's de-facto acceptance criterion is reconstruction
    # error + end accuracy, SURVEY.md §4)
    from channel_pruning_tpu.pipeline import prune as P

    def logits(graph, pars):
        fwd = build_forward(graph, capture=("fc8",), jit=False)
        outs = [np.asarray(fwd(to_device_params(pars), {"data": x})[1]["fc8"])
                for x in inputs]
        return np.concatenate(outs)

    g_b, p_b = g, {k: dict(v) for k, v in params.items()}
    convs = list(g.convs)
    for i, consumer in enumerate(convs[1:], 1):
        producer = P.producer_conv(g_b, g_b.layer(consumer).bottoms[0],
                                   before=consumer)
        t = targets.get(producer)
        if t is None:
            continue
        keep = P.magnitude_select(p_b[consumer]["W"], t)
        base = P.PruneResult(keep=keep, W=p_b[consumer]["W"][:, keep],
                             b=p_b[consumer].get("b"), alpha=0.0,
                             rmse_before=0.0, rmse_after=0.0)
        g_b, p_b = P.apply_pruning(g_b, p_b, consumer, base)
    ref = logits(g, params)
    err_lasso = np.linalg.norm(logits(res.graph, res.params) - ref)
    err_base = np.linalg.norm(logits(g_b, p_b) - ref)
    assert err_lasso < err_base, (err_lasso, err_base)


@pytest.mark.slow
def test_solve_3c_end_to_end(setup):
    g, params, inputs, cfg, cache = setup
    ranks = {"conv1_2": 6, "conv2_1": 9, "conv2_2": 9, "conv3_1": 12,
             "conv3_2": 12}
    res = c3.solve_3c(g, params, cache, cfg, ranks, verbose=False)
    res.graph.validate()
    # every decomposed conv became a V/H/P triple
    for conv in ranks:
        assert res.graph.has_layer(f"{conv}_V")
        assert res.graph.has_layer(f"{conv}_H")
        assert res.graph.has_layer(f"{conv}_P")
        assert not res.graph.has_layer(conv)
        V = res.params[f"{conv}_V"]["W"]
        H = res.params[f"{conv}_H"]["W"]
        P = res.params[f"{conv}_P"]["W"]
        assert V.shape[2:] == (3, 1) and H.shape[2:] == (1, 3) \
            and P.shape[2:] == (1, 1)
        assert V.shape[0] == ranks[conv] == H.shape[1]
    # pruning arm ran: P rows of each non-final decomposed conv shrank
    assert res.selections, "no channel selections recorded"
    for consumer, keep in res.selections.items():
        # a decomposed consumer's inputs live on its V conv
        key = f"{consumer}_V" if f"{consumer}_V" in res.params else consumer
        assert res.params[key]["W"].shape[1] == keep.sum()
    # forward runs and yields normalised probabilities
    p = _final_probs(res.graph, res.params, inputs[0])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_solve_prune_bottom_band_exact_structure(setup):
    """solve.band=bottom (released-table mode) reproduces the requested
    channel counts EXACTLY — structural fidelity is the acceptance criterion
    when targeting a released prototxt (e.g. channel_pruning.prototxt,
    resnet-50-cp.prototxt)."""
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6, "conv2_1": 8, "conv2_2": 9,
               "conv3_1": 10}
    cfg2 = cfg.replace_nested("solve.band", "bottom")
    res = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                         verbose=False)
    res.graph.validate()
    for prod, t in targets.items():
        assert res.params[prod]["W"].shape[0] == t, (
            prod, res.params[prod]["W"].shape[0], t)


def test_pipelined_pass_matches_sequential(setup):
    """The async pipelined chain pass (padded one-bucket fused solves,
    device-to-device running updates, deferred host fetches) selects the
    SAME channels as the sequential per-layer pass — zero-padding is
    arithmetically inert through the CD kernel and the search epilogue
    (c3._pipelined_conv_pass docstring). Reconstructed weights agree to fp
    reduction-order tolerance (XLA tiles the padded matmuls differently)."""
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6, "conv2_1": 8, "conv2_2": 9,
               "conv3_1": 10}
    cfg2 = cfg.replace_nested("solve.band", "bottom")
    piped = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                           verbose=False)
    seq = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                         verbose=False, _no_pipeline=True)
    assert set(piped.selections) == set(seq.selections)
    for name in seq.selections:
        np.testing.assert_array_equal(piped.selections[name],
                                      seq.selections[name]), name
    for name in seq.selections:
        np.testing.assert_allclose(piped.params[name]["W"],
                                   seq.params[name]["W"],
                                   rtol=1e-2, atol=1e-4)
    for pr, sr in zip(piped.reports, seq.reports):
        assert pr.conv == sr.conv
        np.testing.assert_allclose(pr.rmse_after, sr.rmse_after, rtol=1e-4)


def test_pipelined_pass_fenced_diag(setup, monkeypatch, capsys):
    """CP_TPU_PHASE_TIMING attribution in the pipelined pass: the fences
    must not change selections, and per-layer + totals lines must print."""
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6}
    cfg2 = cfg.replace_nested("solve.band", "bottom")
    base = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                          verbose=False)
    monkeypatch.setattr(c3, "_PHASE_TIMING", True)
    fenced = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                            verbose=False)
    out = capsys.readouterr().out
    assert "[fenced-diag] totals over" in out
    assert "fused-solve" in out
    for name in base.selections:
        np.testing.assert_array_equal(fenced.selections[name],
                                      base.selections[name])


def test_select_and_reconstruct_pad_to_inert():
    """`pad_to` (the shared fused-solve bucket the 3C pruning arm uses)
    must not change the selection, and the reconstruction must agree to fp
    reduction-order tolerance."""
    from channel_pruning_tpu.pipeline import prune
    rng = np.random.default_rng(3)
    N, c, n, k = 2000, 24, 40, 3
    X = np.maximum(rng.normal(0, 1, (N, c, k, k)).astype(np.float32), 0)
    W2 = (rng.normal(0, 1, (n, c, k, k)).astype(np.float32)) / (c * k)
    Y = np.einsum("nchw,ochw->no", X, W2).astype(np.float32)
    r1 = prune.select_and_reconstruct(X, W2, Y, 12, fused=True)
    r2 = prune.select_and_reconstruct(X, W2, Y, 12, fused=True,
                                      pad_to=(64, 64))
    np.testing.assert_array_equal(r1.keep, r2.keep)
    np.testing.assert_allclose(r1.W, r2.W, rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(r1.rmse_after, r2.rmse_after, rtol=1e-4)


def test_one_compile_across_layer_ranks():
    """Compile-count discipline (the round-4 perf pathology): the fused
    layer solve and the ITQ device loop must share ONE compiled program
    across different per-layer keep targets / ranks — a static rank
    recompiled a 10-40 s program per layer while the program itself runs
    in ms."""
    import jax.numpy as jnp

    from channel_pruning_tpu.ops import lowrank
    from channel_pruning_tpu.pipeline import prune

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(200, 16)).astype(np.float32)
    gt = rng.normal(size=(200, 16)).astype(np.float32)
    base_itq = lowrank._itq_loop_device._cache_size()
    lowrank._itq_solve_T(feat, gt, 5, (0.1,), (2,))
    lowrank._itq_solve_T(feat, gt, 9, (0.1,), (2,))
    assert lowrank._itq_loop_device._cache_size() - base_itq <= 1

    N, c, n, k = 500, 8, 12, 3
    X = np.maximum(rng.normal(size=(N, c, k, k)).astype(np.float32), 0)
    W2 = rng.normal(size=(n, c, k, k)).astype(np.float32) / (c * k)
    Y = np.einsum("nchw,ochw->no", X, W2).astype(np.float32)
    rows = jnp.asarray(rng.integers(0, N, size=25))
    base_fl = prune._fused_layer_solve._cache_size()
    for rank in (3, 5):
        prune._fused_layer_solve(jnp.asarray(X), jnp.asarray(W2),
                                 jnp.asarray(Y), rows, jnp.int32(rank),
                                 0.1, 1e-3, 8, 4, 50, "top", 0.0)
    assert prune._fused_layer_solve._cache_size() - base_fl <= 1


def test_pipelined_degenerate_falls_back(setup, monkeypatch):
    """A layer whose fused selection comes back empty aborts the pipelined
    pass and restarts the whole solve on the sequential path (which has the
    magnitude fallback) — the result is still well-formed."""
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6}
    from channel_pruning_tpu.pipeline import prune as P
    real = P._fused_layer_solve
    calls = {"n": 0}

    def sabotaged(Xd, W2d, Yd, rows, rank, *a, **kw):
        out = real(Xd, W2d, Yd, rows, rank, *a, **kw)
        calls["n"] += 1
        import jax.numpy as jnp
        return (jnp.zeros_like(out[0]),) + tuple(out[1:])

    monkeypatch.setattr(c3, "_fused_layer_solve", sabotaged, raising=False)
    import channel_pruning_tpu.pipeline.prune as prune_pkg
    monkeypatch.setattr(prune_pkg, "_fused_layer_solve", sabotaged)
    res = c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                         verbose=False)
    res.graph.validate()
    assert calls["n"] >= 1            # the pipelined attempt ran and aborted
    assert len(res.selections) == 2   # sequential fallback completed


def test_ranks_for_speed():
    base = {"conv2_1": 37, "conv5_1": 398}
    r4 = c3.ranks_for_speed(base, 4.0)
    assert r4 == {"conv2_1": 37, "conv5_1": 398}
    r2 = c3.ranks_for_speed(base, 2.0)
    assert r2["conv2_1"] == 74 and r2["conv5_1"] == 398  # conv5 exempt


def test_alter_refinement_runs(setup):
    """dic.alter-style alternating refinement returns a valid selection of
    comparable quality (reference decompose.py:526-580)."""
    from channel_pruning_tpu.pipeline import prune as P
    from channel_pruning_tpu.sampling import sample_patches

    g, params, inputs, cfg, cache = setup
    conv = "conv2_2"
    top = g.layer(conv).tops[0]
    X = sample_patches(g, to_device_params(params), inputs, conv, cache.plan,
                       chunk_batches=4)
    Y = cache.feats[top] - params[conv]["b"]
    base = P.select_and_reconstruct(X, params[conv]["W"], Y, 8, seed=0)
    alt = P.select_and_reconstruct(X, params[conv]["W"], Y, 8, seed=0,
                                   alter_iters=2)
    assert alt.keep.sum() >= 4   # refinement must not collapse the support
    assert alt.rmse_after <= base.rmse_after * 1.5


def test_fitfc_prunes_last_conv(setup):
    """dic.fitfc: the last conv's outputs are pruned through the first FC
    layer's inputs (reference fitfc knob, lib/cfgs.py:73)."""
    g, params, inputs, cfg, cache = setup
    last_conv = g.convs[-1]
    n_out = params[last_conv]["W"].shape[0]
    cfg2 = cfg.replace_nested("dic.fitfc", True)
    targets = {last_conv: max(2, int(n_out * 0.6))}
    res = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                         verbose=False)
    fc = g.fcs[0]
    assert fc in res.selections
    keep = res.selections[fc]
    assert res.params[last_conv]["W"].shape[0] == keep.sum() < n_out
    # FC weight columns sliced consistently
    hw = res.params[fc]["W"].shape[1] // int(keep.sum())
    assert res.params[fc]["W"].shape[1] == keep.sum() * hw
    p = _final_probs(res.graph, res.params, inputs[0])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_solve_checkpoint_resume(setup, tmp_path):
    """A solve killed mid-pass must resume from the last snapshot and yield
    the exact same result as an uninterrupted run."""
    from channel_pruning_tpu.pipeline import prune as P
    from channel_pruning_tpu.pipeline.checkpoint import SolveCheckpoint

    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6, "conv2_1": 8, "conv2_2": 9,
               "conv3_1": 10}
    ref = c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                         verbose=False)

    ck = SolveCheckpoint(tmp_path / "state.pkl", every=1)
    orig_sr = P.select_and_reconstruct
    orig_fl = P._fused_layer_solve
    calls = {"n": 0}

    def _tick():
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated TPU worker crash")

    def crashing_sr(*a, **k):
        _tick()
        return orig_sr(*a, **k)

    def crashing_fl(*a, **k):
        _tick()  # per-layer dispatch in the pipelined pass
        return orig_fl(*a, **k)

    P.select_and_reconstruct = crashing_sr
    P._fused_layer_solve = crashing_fl
    try:
        with pytest.raises(RuntimeError):
            c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                           checkpoint=ck, verbose=False)
    finally:
        P.select_and_reconstruct = orig_sr
        P._fused_layer_solve = orig_fl
    assert (tmp_path / "state.pkl").exists()

    resumed = c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                             checkpoint=ck, verbose=False)
    assert not (tmp_path / "state.pkl").exists()   # cleared on success
    assert set(resumed.selections) == set(ref.selections)
    for k in ref.selections:
        np.testing.assert_array_equal(resumed.selections[k],
                                      ref.selections[k])
    for k, v in ref.params.items():
        np.testing.assert_allclose(np.asarray(resumed.params[k]["W"]),
                                   np.asarray(v["W"]), rtol=1e-5)


def test_fused_layer_solve_matches_default():
    """pipeline/prune._fused_layer_solve (whole layer solve as ONE device
    program) must reproduce the host-stepped select_and_reconstruct:
    identical keep masks, W equal up to fp reduction order, same rMSE."""
    import numpy as np

    from channel_pruning_tpu.pipeline import prune

    rng = np.random.default_rng(0)
    N, c, n, k = 4000, 64, 128, 3
    base = rng.normal(0, 1, (N, c // 4, k, k)).astype(np.float32)
    mix = rng.normal(0, 0.5, (c // 4, c)).astype(np.float32)
    X = np.maximum(np.einsum("nqhw,qc->nchw", base, mix)
                   + 0.3 * rng.normal(0, 1, (N, c, k, k)).astype(np.float32), 0)
    W2 = ((rng.normal(0, 1, (n, c, k, k))
           * (rng.uniform(size=(1, c, 1, 1)) < 0.7)).astype(np.float32)
          / (c * k))
    Y = np.einsum("nchw,ochw->no", X, W2).astype(np.float32)
    for prefer in ("top", "bottom"):
        r1 = prune.select_and_reconstruct(X, W2, Y, 40, prefer=prefer)
        r2 = prune.select_and_reconstruct(X, W2, Y, 40, prefer=prefer,
                                          fused=True)
        assert (r1.keep == r2.keep).all()
        rel = (np.max(np.abs(r1.W - r2.W))
               / max(np.max(np.abs(r1.W)), 1e-9))
        assert rel < 1e-4, rel
        assert abs(r1.rmse_after - r2.rmse_after) < 1e-3


def test_deploy_exports_pruned_graph(setup, tmp_path):
    """The StableHLO serving export (deploy.py) must replay a PRUNED graph —
    shrunk convs + zero-scattered consumers — bit-comparably to the
    framework's own forward (the reference's deploy story hands the pruned
    prototxt+caffemodel to stock Caffe, README.md:100)."""
    from channel_pruning_tpu import deploy

    g, params, inputs, cfg, cache = setup
    targets = {"conv2_1": 8, "conv2_2": 9}
    res = c3.solve_prune(g, params, cache, cfg, channel_targets=targets,
                         verbose=False)
    want = _final_probs(res.graph, res.params, inputs[0])
    path = tmp_path / "pruned.stablehlo"
    deploy.export_serialized(res.graph, res.params, path, output="prob")
    got = np.asarray(deploy.load_serialized(path)(inputs[0]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_solve_3c_small_default_suite(setup):
    """A small 3C end-to-end stays in the DEFAULT suite (the full-schedule
    five-layer variant is slow-marked): the padded VH/ITQ bucket programs,
    the pruning arm, and the emitted V/H/P topology are all exercised on
    every default run — a numerical regression in the shared-bucket path
    cannot slip through to the slow tier."""
    import dataclasses

    g, params, inputs, cfg, cache = setup
    solve = dataclasses.replace(cfg.solve, nonlinear_iters=(4, 2),
                                itq_iters=(4, 2))
    cfg_fast = dataclasses.replace(cfg, solve=solve)
    ranks = {"conv2_1": 9, "conv2_2": 9}
    res = c3.solve_3c(g, params, cache, cfg_fast, ranks, verbose=False)
    res.graph.validate()
    for conv in ranks:
        assert res.graph.has_layer(f"{conv}_V")
        assert res.graph.has_layer(f"{conv}_H")
        assert res.graph.has_layer(f"{conv}_P")
        assert not res.graph.has_layer(conv)
        assert res.params[f"{conv}_V"]["W"].shape[0] == ranks[conv]
    assert res.selections, "pruning arm did not run"
    p = _final_probs(res.graph, res.params, inputs[0])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_autodet_pipeline_knob(setup):
    """--set solve.autodet=true: the whole-model solve selects with ONE
    fixed-alpha LASSO per layer (alpha = solve.alpha / c**dic.layeralpha)
    and the kept counts are support-free — not clamped into the target
    band (reference c.autodet / dic.layeralpha, lib/cfgs.py:70,110)."""
    g, params, inputs, cfg, cache = setup
    targets = {"conv1_1": 5, "conv1_2": 6, "conv2_1": 8}
    cfg2 = cfg.replace_nested("solve.autodet", True)
    cfg2 = cfg2.replace_nested("solve.alpha", 1e-4)
    res = c3.solve_prune(g, params, cache, cfg2, channel_targets=targets,
                         verbose=False)
    res.graph.validate()
    assert res.selections
    for r in res.reports:
        c_in = r.total
        np.testing.assert_allclose(r.alpha, 1e-4 / c_in, rtol=1e-6)
    p = _final_probs(res.graph, res.params, inputs[0])
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)
