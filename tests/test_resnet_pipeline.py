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


def test_invbn_by_design_equivalence():
    """The reference rescales residual-compensation targets by the inverse
    BN/Scale gain when the consumer carries a BN+Scale (invBN,
    lib/net.py:1200-1217, applied at 1716-1719): it fits the RAW conv
    against Y_ref = (gt_raw − b) + (std/k)·Δshortcut. We instead fold BN at
    preprocess and compute every target on the folded running graph, in the
    post-BN domain. The two are the same problem: the folded consumer's
    weights are W' = diag(k/std)·W, and this test asserts the folded-domain
    target our solve computes (gt(block) − b' − cur(shortcut)) equals
    diag(k/std) · Y_ref EXACTLY — so the per-output-row least-squares
    reconstructions map onto each other by the same row scaling (lstsq rows
    are independent), and no inverse-BN pullback is needed by design."""
    from channel_pruning_tpu.graph.ir import Graph, Layer, TensorSpec
    from channel_pruning_tpu.graph import rewrite

    layers = [
        Layer.make("convS", LT.CONV, ["data"], num_output=6, kernel_size=1,
                   stride=1, pad=0, bias=True),
        Layer.make("conv1", LT.CONV, ["data"], num_output=5, kernel_size=3,
                   stride=1, pad=1, bias=True),
        Layer.make("conv1_relu", LT.RELU, ["conv1"], ["conv1"]),
        Layer.make("conv2", LT.CONV, ["conv1"], num_output=6, kernel_size=3,
                   stride=1, pad=1, bias=True),
        Layer.make("bn2", LT.BN, ["conv2"], ["conv2_bn"], eps=1e-9),
        Layer.make("scale2", LT.SCALE, ["conv2_bn"], ["conv2_sc"], bias=True),
        Layer.make("blk", LT.ELTWISE, ["convS", "conv2_sc"], operation="sum"),
    ]
    g0 = Graph(name="invbn", inputs=(TensorSpec("data", (2, 3, 8, 8)),),
               layers=tuple(layers))
    g0.validate()
    from channel_pruning_tpu.models.vgg import init_params
    rng = np.random.default_rng(3)
    p0 = init_params(g0, seed=3)
    p0["bn2"]["mean"] = rng.normal(0, 0.2, 6).astype(np.float32)
    p0["bn2"]["var"] = (1.0 + rng.uniform(0, 0.8, 6)).astype(np.float32)
    p0["scale2"]["W"] = (1.0 + rng.normal(0, 0.3, 6)).astype(np.float32)
    p0["scale2"]["b"] = rng.normal(0, 0.2, 6).astype(np.float32)
    # the running net's shortcut has drifted (upstream already pruned)
    p_cur = {k: dict(v) for k, v in p0.items()}
    p_cur["convS"] = dict(p_cur["convS"])
    p_cur["convS"]["W"] = (p_cur["convS"]["W"]
                           + 0.1 * rng.normal(size=p_cur["convS"]["W"].shape)
                           ).astype(np.float32)

    x = rng.normal(0, 1, (2, 3, 8, 8)).astype(np.float32)

    def resp(graph, params, tensor):
        _, caps = build_forward(graph, capture=(tensor,), jit=False)(
            to_device_params(params), {"data": x})
        a = np.asarray(caps[tensor], np.float64)
        return a.transpose(0, 2, 3, 1).reshape(-1, a.shape[1])

    # ---- the reference's raw-domain target -----------------------------
    eps = 1e-9
    std = np.sqrt(p0["bn2"]["var"].astype(np.float64) + eps)
    k = p0["scale2"]["W"].astype(np.float64)
    gt_raw = resp(g0, p0, "conv2")          # pre-BN conv responses, orig net
    gt_short = resp(g0, p0, "convS")
    cur_short = resp(g0, p_cur, "convS")
    b2 = p0["conv2"]["b"].astype(np.float64)
    Y_ref = (gt_raw - b2) + (std / k) * (gt_short - cur_short)

    # ---- our folded-domain target (what solve_prune computes) ----------
    g, p = rewrite.merge_bn(g0, p0)
    assert not g.bns and not g.scales
    p_fold_cur = {kk: dict(v) for kk, v in p.items()}
    p_fold_cur["convS"] = dict(p_cur["convS"])
    gt_block = resp(g, p, "blk")            # frozen-cache gt of the Eltwise
    cur_short_f = resp(g, p_fold_cur, "convS")
    b2f = p["conv2"]["b"].astype(np.float64)
    Y_fold = gt_block - b2f - cur_short_f

    np.testing.assert_allclose(Y_fold, (k / std) * Y_ref,
                               rtol=1e-5, atol=1e-6)
