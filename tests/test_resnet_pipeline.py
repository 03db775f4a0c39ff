"""ResNet pruning path: BN fold, shared residual sample points, Select
(Filter) gates at block inputs, residual-compensated reconstruction —
the reference's resnet machinery (lib/net.py:466-497, 1641-1683,
temp/resnet-50-cp.prototxt Filter layers)."""
import numpy as np
import pytest

from channel_pruning_tpu.graph.ir import LT
from channel_pruning_tpu.models.resnet import build_tiny_resnet
from channel_pruning_tpu.ops.forward import build_forward, to_device_params
from channel_pruning_tpu.pipeline import c3
from channel_pruning_tpu.sampling import freeze
from channel_pruning_tpu.sampling.sampler import resnet_share_key
from channel_pruning_tpu.utils.config import default_config


@pytest.fixture(scope="module")
def setup():
    g0, p0 = build_tiny_resnet(batch=4, image_size=32)
    g, p = c3.preprocess(g0, p0)      # BN fold + ReLU split
    rng = np.random.default_rng(11)
    inputs = rng.normal(0, 1, (8, 4, 3, 32, 32)).astype(np.float32)
    cfg = default_config()
    cache = freeze(g, to_device_params(p), inputs, n_points=8, seed=0,
                   chunk_batches=4, share_key=resnet_share_key(g))
    return g0, p0, g, p, inputs, cfg, cache


def test_preprocess_folds_bn(setup):
    g0, p0, g, p, inputs, cfg, cache = setup
    assert not g.bns and not g.scales
    # folded graph computes the same function
    x = inputs[0]
    o0, _ = build_forward(g0, jit=False)(to_device_params(p0), {"data": x})
    o1, _ = build_forward(g, jit=False)(to_device_params(p), {"data": x})
    np.testing.assert_allclose(np.asarray(o0["prob"]), np.asarray(o1["prob"]),
                               rtol=1e-3, atol=1e-5)


def test_residual_points_shared(setup):
    _, _, g, p, inputs, cfg, cache = setup
    share = resnet_share_key(g)
    for e in g.by_type(LT.ELTWISE):
        bottoms_and_top = list(e.bottoms) + [e.tops[0]]
        planned = [t for t in bottoms_and_top if t in cache.plan]
        assert len(planned) >= 2
        ys0, xs0 = cache.plan[planned[0]]
        for t in planned[1:]:
            np.testing.assert_array_equal(cache.plan[t][0], ys0)
            np.testing.assert_array_equal(cache.plan[t][1], xs0)


@pytest.mark.slow
def test_resnet_prune_end_to_end(setup):
    _, _, g, p, inputs, cfg, cache = setup
    # shrink branch2a/2b widths; gate every block input ahead of branch2a
    channel_targets = {}
    input_targets = {}
    for conv in g.convs:
        n = int(g.layer(conv).attr("num_output"))
        if conv.endswith("branch2a") or conv.endswith("branch2b"):
            channel_targets[conv] = max(2, int(n * 0.7))
        if conv.endswith("branch2a"):
            cin = None
            input_targets[conv] = None
    # input gates: keep 70% of each block input
    for conv in list(input_targets):
        w = p[conv]["W"]
        input_targets[conv] = max(2, int(w.shape[1] * 0.7))

    res = c3.solve_prune(g, p, cache, cfg, channel_targets=channel_targets,
                         input_targets=input_targets, verbose=False)
    res.graph.validate()
    # Select gates inserted ahead of every branch2a
    selects = res.graph.by_type(LT.SELECT)
    b2a = [c for c in g.convs if c.endswith("branch2a")]
    assert len(selects) == len(b2a), (len(selects), len(b2a))
    for s in selects:
        cons = [c.name for c in res.graph.consumers(s.tops[0])]
        assert len(cons) == 1 and cons[0].endswith("branch2a")
        # the shortcut path must NOT consume the gated tensor
    # producers physically shrunk to the target band
    for prod, t in channel_targets.items():
        got = res.params[prod]["W"].shape[0]
        assert t <= got <= t + max(1, int(cfg.dic.rank_tol * t) + 1), (prod, t, got)
    # pruned net runs, probabilities normalised
    fwd = build_forward(res.graph, capture=("prob",), jit=False)
    _, caps = fwd(to_device_params(res.params), {"data": inputs[0]})
    prob = np.asarray(caps["prob"])
    np.testing.assert_allclose(prob.sum(-1), 1.0, rtol=1e-4)


def test_residual_compensation_reduces_block_error(setup):
    """Fitting against gt(block) − cur(shortcut) must reconstruct the BLOCK
    output at least as well as fitting the branch alone."""
    _, _, g, p, inputs, cfg, cache = setup
    targets = {c: max(2, int(int(g.layer(c).attr("num_output")) * 0.6))
               for c in g.convs if c.endswith("branch2b")}

    res_comp = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                              residual_compensate=True, verbose=False)
    res_naive = c3.solve_prune(g, p, cache, cfg, channel_targets=targets,
                               residual_compensate=False, verbose=False)

    # compare block-output error on a fresh batch
    block = g.by_type(LT.ELTWISE)[-1].tops[0]
    x = inputs[-1]
    _, ref_caps = build_forward(g, capture=(block,), jit=False)(
        to_device_params(p), {"data": x})
    a = np.asarray(ref_caps[block])

    def block_err(r):
        _, caps = build_forward(r.graph, capture=(block,), jit=False)(
            to_device_params(r.params), {"data": x})
        b = np.asarray(caps[block])
        return np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a ** 2))

    e_comp, e_naive = block_err(res_comp), block_err(res_naive)
    assert e_comp <= e_naive * 1.10, (e_comp, e_naive)


def test_deploy_exports_select_gated_graph(setup, tmp_path):
    """StableHLO export must carry the SELECT (Filter) channel gate: a
    gated residual graph replays identically through the serialized
    artifact (gates are compile-time gathers, rewrite.insert_select)."""
    from channel_pruning_tpu import deploy
    from channel_pruning_tpu.graph import rewrite

    _, _, g, p, inputs, _, _ = setup
    b2a = next(c for c in g.convs if c.endswith("branch2a"))
    bottom = g.layer(b2a).bottoms[0]
    cin = p[b2a]["W"].shape[1]
    keep = np.zeros(cin, bool)
    keep[:: 2] = True
    gated = rewrite.insert_select(g, bottom, b2a, keep)
    pg = {k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in p.items()}
    pg[b2a] = dict(pg[b2a])
    pg[b2a]["W"] = pg[b2a]["W"][:, keep]

    fwd = build_forward(gated, capture=("prob",), jit=False)
    _, caps = fwd(to_device_params(pg), {"data": inputs[0]})
    want = np.asarray(caps["prob"])
    path = tmp_path / "gated.stablehlo"
    deploy.export_serialized(gated, pg, path, output="prob")
    got = np.asarray(deploy.load_serialized(path)(inputs[0]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pipelined_dag_pass_matches_sequential(setup):
    """Residual topologies now ride the async pipelined one-program solve
    (round-5 DAG extension of c3._pipelined_conv_pass): gate-only targets,
    residual-compensated block-ending consumers, and plain shrink targets
    must all produce EXACTLY the sequential path's selections — and the
    pipelined pass must actually complete (no _PipelineDegenerate restart)."""
    _, _, g, p, inputs, cfg, cache = setup
    channel_targets = {}
    input_targets = {}
    for conv in g.convs:
        n = int(g.layer(conv).attr("num_output"))
        if conv.endswith("branch2a") or conv.endswith("branch2b"):
            channel_targets[conv] = max(2, int(n * 0.7))
        if conv.endswith("branch2a"):
            input_targets[conv] = max(2, int(p[conv]["W"].shape[1] * 0.7))
    cfg2 = cfg.replace_nested("solve.band", "bottom")

    completions = []
    orig_pass = c3._pipelined_conv_pass

    def _spy(*args, **kwargs):
        out = orig_pass(*args, **kwargs)   # raises _PipelineDegenerate on bail
        completions.append(True)
        return out

    c3._pipelined_conv_pass = _spy
    try:
        piped = c3.solve_prune(g, p, cache, cfg2,
                               channel_targets=channel_targets,
                               input_targets=input_targets, verbose=False)
    finally:
        c3._pipelined_conv_pass = orig_pass
    assert completions, "pipelined DAG pass was not taken (or degenerated)"
    seq = c3.solve_prune(g, p, cache, cfg2, channel_targets=channel_targets,
                         input_targets=input_targets, verbose=False,
                         _no_pipeline=True)
    assert set(piped.selections) == set(seq.selections)
    for name in seq.selections:
        np.testing.assert_array_equal(piped.selections[name],
                                      seq.selections[name]), name
    piped.graph.validate()
    # the gate layers produced Select gates, one per branch2a (as the
    # sequential test asserts), and the pruned net still runs
    b2a = [c for c in g.convs if c.endswith("branch2a")]
    assert len(piped.graph.by_type(LT.SELECT)) == len(b2a)
    from channel_pruning_tpu.ops.forward import build_forward
    _, caps = build_forward(piped.graph, capture=("prob",), jit=False)(
        to_device_params(piped.params), {"data": inputs[0]})
    np.testing.assert_allclose(np.asarray(caps["prob"]).sum(-1), 1.0,
                               rtol=1e-4)
    # weights agree with the sequential pass to fp reduction-order tolerance
    for name in seq.selections:
        np.testing.assert_allclose(piped.params[name]["W"],
                                   seq.params[name]["W"],
                                   rtol=5e-3, atol=5e-5)
