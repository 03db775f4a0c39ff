"""Multi-device (8-way virtual CPU mesh) tests: DP finetune step, eval,
sharded Gram/lstsq reductions — the pjit/ICI story of SURVEY.md §2.3."""
import jax
import numpy as np
import pytest

from channel_pruning_tpu.models.vgg import build_tiny_vgg
from channel_pruning_tpu.ops import lasso, lstsq
from channel_pruning_tpu.parallel import mesh as mesh_mod
from channel_pruning_tpu.parallel import sharded
from channel_pruning_tpu.train import evaluate, finetune
from channel_pruning_tpu.utils.config import FinetuneConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return mesh_mod.make_mesh(8)


def test_sharded_lasso_gram_matches_local(rng, mesh):
    Z = rng.normal(size=(203, 24)).astype(np.float32)   # deliberately not /8
    y = rng.normal(size=203).astype(np.float32)
    g_local = lasso.lasso_gram(Z, y)
    g_shard = sharded.sharded_lasso_gram(Z, y, mesh)
    assert g_shard.n_samples == 203
    np.testing.assert_allclose(np.asarray(g_shard.G), np.asarray(g_local.G),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_shard.b), np.asarray(g_local.b),
                               rtol=1e-4, atol=1e-3)


def test_sharded_lstsq_matches_local(rng, mesh):
    X = rng.normal(size=(317, 20)).astype(np.float32)
    Y = rng.normal(size=(317, 6)).astype(np.float32)
    W_s, b_s = sharded.sharded_lstsq(X, Y, mesh)
    W_l, b_l = lstsq.fit_linear(X, Y)
    np.testing.assert_allclose(np.asarray(W_s), np.asarray(W_l),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b_s), np.asarray(b_l),
                               rtol=1e-3, atol=1e-3)


def test_sharded_freeze_matches_single_device(mesh):
    """Data-parallel sampling: with the calibration batch sharded over the
    mesh the frozen features must be BIT-identical to the one-device pass
    (the extraction is image-parallel; XLA inserts no cross-image math)."""
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.sampling import freeze

    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(3)
    inputs = rng.normal(0, 1, (8, 4, 3, 16, 16)).astype(np.float32)
    dev = to_device_params(params)
    c_single = freeze(g, dev, inputs, n_points=5, seed=0, chunk_batches=8)
    c_mesh = freeze(g, dev, inputs, n_points=5, seed=0, chunk_batches=8,
                    mesh=mesh)
    assert c_single.feats.keys() == c_mesh.feats.keys()
    for t in c_single.feats:
        np.testing.assert_array_equal(c_single.feats[t], c_mesh.feats[t]), t


@pytest.mark.slow
def test_solve_prune_on_mesh_matches_single_device(mesh):
    """solve_prune with the solver reductions sharded over the mesh must
    reproduce the single-device channel selections exactly (VERDICT r1 #5:
    sample-dimension sharding as a behavior, not just a library)."""
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.utils.config import default_config

    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(11)
    inputs = rng.normal(0, 1, (4, 4, 3, 16, 16)).astype(np.float32)
    cache = freeze(g, to_device_params(params), inputs, n_points=6, seed=0,
                   chunk_batches=2)
    targets = {c: max(2, int(g.layer(c).attr("num_output")) * 2 // 3)
               for c in list(g.convs)[:-1]}
    cfg = default_config()
    # the async-pipelined conv pass must actually be TAKEN under the mesh
    # (round 4 lifted its mesh=None gate); a silent _PipelineDegenerate
    # fallback to the sequential path would still pass the parity asserts
    # below, so spy on the dispatch.
    pipelined_meshes = []
    orig_pass = c3._pipelined_conv_pass

    def _spy(*args, **kwargs):
        pipelined_meshes.append(kwargs.get("mesh"))
        return orig_pass(*args, **kwargs)

    c3._pipelined_conv_pass = _spy
    try:
        res_mesh = c3.solve_prune(g, params, cache, cfg,
                                  channel_targets=targets,
                                  mesh=mesh, verbose=False)
        res_solo = c3.solve_prune(g, params, cache, cfg,
                                  channel_targets=targets, verbose=False)
    finally:
        c3._pipelined_conv_pass = orig_pass
    assert any(m is not None for m in pipelined_meshes), \
        "mesh run fell back off the pipelined pass"
    assert set(res_mesh.selections) == set(res_solo.selections)
    for k in res_solo.selections:
        np.testing.assert_array_equal(res_mesh.selections[k],
                                      res_solo.selections[k])
    # reconstructions agree to reduction-order tolerance
    for k in res_solo.params:
        for kk, v in res_solo.params[k].items():
            np.testing.assert_allclose(np.asarray(res_mesh.params[k][kk]),
                                       np.asarray(v), rtol=5e-2, atol=2e-2)


def test_dp_train_step_runs_and_learns(mesh):
    g, params = build_tiny_vgg(batch=8, image_size=16)
    cfg = FinetuneConfig(base_lr=1e-2, max_iter=10, snapshot_every=10**9)
    state = finetune.init_state(g, params, cfg, mesh)
    step = finetune.build_train_step(g, cfg, mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (16, 3, 16, 16)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        state, m = step(state, x, y, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses       # overfits a fixed batch
    assert state.step == 8


def test_dp_grads_match_single_device(mesh):
    """The mesh step must compute the same update as the unsharded step."""
    g, params = build_tiny_vgg(batch=8, image_size=16)
    cfg = FinetuneConfig(base_lr=1e-2)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (16, 3, 16, 16)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int32)
    key = jax.random.PRNGKey(3)

    s_mesh = finetune.init_state(g, params, cfg, mesh)
    s_solo = finetune.init_state(g, params, cfg, None)
    step_mesh = finetune.build_train_step(g, cfg, mesh, donate=False)
    step_solo = finetune.build_train_step(g, cfg, None, donate=False)
    s_mesh, m1 = step_mesh(s_mesh, x, y, key)
    s_solo, m2 = step_solo(s_solo, x, y, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    w_a = np.asarray(s_mesh.params["conv1_1"]["W"])
    w_b = np.asarray(s_solo.params["conv1_1"]["W"])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-4, atol=1e-6)


def test_evaluate_counts(mesh):
    g, params = build_tiny_vgg(batch=8, image_size=16)
    rng = np.random.default_rng(2)

    def batches():
        for _ in range(3):
            x = rng.normal(0, 1, (16, 3, 16, 16)).astype(np.float32)
            y = rng.integers(0, 10, 16).astype(np.int32)
            yield x, y

    res = evaluate.evaluate(g, params, batches(), mesh=mesh)
    assert res["n_images"] == 48
    assert 0.0 <= res["accuracy@1"] <= res["accuracy@5"] <= 1.0


def test_finetune_loop_with_snapshot(tmp_path):
    g, params = build_tiny_vgg(batch=4, image_size=16)
    cfg = FinetuneConfig(base_lr=1e-2, snapshot_every=5)
    data = finetune.synthetic_batches(4, image=16, classes=10, seed=0)
    state = finetune.finetune(g, params, data, cfg, max_steps=5,
                              snapshot_dir=str(tmp_path / "snap"), log_every=0)
    assert state.step == 5
    from channel_pruning_tpu.train.checkpoint import Checkpointer
    ck = Checkpointer(tmp_path / "snap")
    assert ck.steps() == [5]
    restored = ck.latest()
    assert restored is not None and int(restored["step"]) == 5
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1_1"]["W"]),
        np.asarray(state.params["conv1_1"]["W"]), rtol=1e-6)


def test_evaluate_cache_replay():
    """Accuracy replay over the frozen cache (reference accuracy(times),
    lib/net.py:929-946)."""
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.train.evaluate import evaluate_cache

    g, params = build_tiny_vgg(batch=4, image_size=16)
    rng = np.random.default_rng(5)
    inputs = rng.normal(0, 1, (3, 4, 3, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 10, (3, 4)).astype(np.int32)
    import jax.numpy as jnp
    cache = freeze(g, {k: {kk: jnp.asarray(v) for kk, v in p.items()}
                       for k, p in params.items()},
                   inputs, n_points=2, chunk_batches=3, labels=labels)
    res = evaluate_cache(g, params, cache)
    assert res["n_images"] == 12
    assert 0.0 <= res["accuracy@1"] <= 1.0


def test_mesh_rolling_frontier_matches_single_device(mesh):
    """VERDICT r2 #3: the rolling frontier with its image axis sharded over
    the mesh must serve bit-identical patches (the dominant solve-phase
    replay work — SURVEY.md §5's N=50k scaling axis). Batch sizes are chosen
    so the zero-batch padding path is exercised (3 batches of 2 images on 8
    devices pads one batch per group)."""
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.sampling import rolling

    g, params = build_tiny_vgg(batch=2, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(21)
    inputs = rng.normal(0, 1, (3, 2, 3, 16, 16)).astype(np.float32)
    dev = to_device_params(params)
    cache = freeze(g, dev, inputs, n_points=4, seed=0, chunk_batches=3)

    r_solo = rolling.RollingReplay(g, inputs)
    r_mesh = rolling.RollingReplay(g, inputs, mesh=mesh)
    assert r_mesh.groups[0].shape[0] % mesh.devices.size == 0  # padded
    convs = list(g.convs)[1:4]
    for conv in convs:
        bottom = g.layer(conv).bottoms[0]
        r_solo.advance_to(dev, bottom)
        r_mesh.advance_to(dev, bottom)
        X_solo = np.asarray(r_solo.patches_at(cache.plan, conv))
        X_mesh = np.asarray(r_mesh.patches_at(cache.plan, conv))
        np.testing.assert_array_equal(X_solo, X_mesh), conv
        top = g.layer(conv).tops[0]
        f_solo = r_solo.features_at(dev, cache.plan, top)
        f_mesh = r_mesh.features_at(dev, cache.plan, top)
        np.testing.assert_array_equal(f_solo, f_mesh), conv


def test_mesh_rolling_dag_matches_single_device(mesh):
    """Same sharded-frontier identity for the DAG (residual) variant."""
    from channel_pruning_tpu.models.resnet import build_tiny_resnet
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.sampling import rolling
    from channel_pruning_tpu.sampling.sampler import resnet_share_key

    g0, p0 = build_tiny_resnet(batch=2, image_size=32)
    g, p = c3.preprocess(g0, p0)
    rng = np.random.default_rng(22)
    inputs = rng.normal(0, 1, (3, 2, 3, 32, 32)).astype(np.float32)
    dev = to_device_params(p)
    cache = freeze(g, dev, inputs, n_points=3, seed=0, chunk_batches=3,
                   share_key=resnet_share_key(g))
    r_solo = rolling.RollingReplayDAG(g, inputs)
    r_mesh = rolling.RollingReplayDAG(g, inputs, mesh=mesh)
    for conv in list(g.convs)[1:5]:
        bottom = g.layer(conv).bottoms[0]
        try:
            r_solo.advance_to(dev, bottom)
            r_mesh.advance_to(dev, bottom)
            X_solo = np.asarray(r_solo.patches_at(cache.plan, conv))
            X_mesh = np.asarray(r_mesh.patches_at(cache.plan, conv))
        except rolling.FrontierError:
            continue
        np.testing.assert_array_equal(X_solo, X_mesh), conv


def test_mesh_sample_patches_matches_single_device(mesh):
    """The full-replay fallback path (sampling.sample_patches) with the
    chunk sharded over the mesh: identical patch rows."""
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.sampling import freeze, sampler

    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(23)
    inputs = rng.normal(0, 1, (8, 4, 3, 16, 16)).astype(np.float32)
    dev = to_device_params(params)
    cache = freeze(g, dev, inputs, n_points=4, seed=0, chunk_batches=8)
    conv = list(g.convs)[2]
    X_solo = sampler.sample_patches(g, dev, inputs, conv, cache.plan,
                                    chunk_batches=8)
    X_mesh = sampler.sample_patches(g, dev, inputs, conv, cache.plan,
                                    chunk_batches=8, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(X_solo), np.asarray(X_mesh))


@pytest.mark.slow
def test_dp_finetune_full_schedule_parity(mesh, tmp_path):
    """VERDICT r2 #7: the data-parallel finetune run for a FULL 400-step
    schedule (lr step decay, snapshots, eval) on the 8-device mesh must
    agree with the 1-device run — same batches, same seed (matches the
    reference's multi-GPU finetune contract, README.md:91).

    Parity is asserted where it is meaningful: the first steps must match
    near-bitwise (the ONLY legal difference is gradient psum reduction
    order, ~1e-6 on the loss — anything larger is a sharding wiring bug),
    and both trajectories must converge. The final accuracies are compared
    only loosely: early SGD on this task is chaotic (loss spikes ~20x at
    step 1), so reduction-order noise amplifies along the trajectory and a
    tight end-point comparison is a coin flip, not a contract."""
    from sklearn.datasets import load_digits

    from channel_pruning_tpu.models.vgg import build_digits_vgg, init_params
    from channel_pruning_tpu.train import finetune as ft
    from channel_pruning_tpu.train.checkpoint import Checkpointer

    digits = load_digits()
    X8 = digits.images.astype(np.float32)          # (1797, 8, 8) in [0,16]
    # upscale to the digits_vgg 32x32x3 input, Caffe-range pixels
    X = np.repeat(np.repeat(X8, 4, axis=1), 4, axis=2) * (255.0 / 16.0) - 128.0
    X = np.repeat(X[:, None], 3, axis=1)           # (N, 3, 32, 32)
    y = digits.target.astype(np.int32)
    Xtr, ytr, Xva, yva = X[:1536], y[:1536], X[1536:], y[1536:]

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(400):
        idx = rng.integers(0, len(Xtr), 64)
        batches.append((Xtr[idx], ytr[idx]))

    g = build_digits_vgg(batch=64)
    params = init_params(g, seed=0)
    from channel_pruning_tpu.utils.config import FinetuneConfig
    cfg = FinetuneConfig(base_lr=1e-3, stepsize=150, gamma=0.1,
                         snapshot_every=200, batch_size=64)

    # near-bitwise early-step parity: psum reduction order is the only
    # permitted difference between the two compiled programs
    import jax.numpy as jnp
    for use_mesh, sink in ((None, []), (mesh, [])):
        state = ft.init_state(g, params, cfg, use_mesh)
        step = ft.build_train_step(g, cfg, use_mesh)
        key = jax.random.PRNGKey(0)
        for x, yy in batches[:2]:
            key, sub = jax.random.split(key)
            state, m = step(state, jnp.asarray(x), jnp.asarray(yy), sub)
            sink.append(float(m["loss"]))
        if use_mesh is None:
            solo_losses = sink
        else:
            mesh_losses = sink
    np.testing.assert_allclose(solo_losses, mesh_losses, rtol=3e-5,
                               err_msg="sharded train step diverges at step 1 "
                                       "— wiring bug, not fp noise")

    s_solo = ft.finetune(g, params, iter(batches), cfg, max_steps=400,
                         snapshot_dir=str(tmp_path / "solo"), log_every=0)
    s_mesh = ft.finetune(g, params, iter(batches), cfg, mesh=mesh,
                         max_steps=400,
                         snapshot_dir=str(tmp_path / "mesh"), log_every=0)
    assert s_solo.step == 400 and s_mesh.step == 400
    # snapshots at the schedule points on both paths
    assert Checkpointer(tmp_path / "solo").steps() == [200, 400]
    assert Checkpointer(tmp_path / "mesh").steps() == [200, 400]

    from channel_pruning_tpu.ops.forward import logits_fn
    lf = logits_fn(g)

    def acc(state):
        import jax.numpy as jnp
        preds = np.asarray(lf(state.params, jnp.asarray(Xva))).argmax(-1)
        return float((preds == yva).mean())

    a_solo, a_mesh = acc(s_solo), acc(s_mesh)
    # the digits task must actually be learned ON BOTH paths (the full
    # schedule — lr decay at 150/300, snapshots at 200/400 — really ran)
    assert a_solo > 0.8, a_solo
    assert a_mesh > 0.8, a_mesh
    # end points agree loosely; chaos-amplified reduction noise bounds this
    assert abs(a_solo - a_mesh) <= 0.1, (a_solo, a_mesh)


def test_clip_gradients_bounds_update():
    """SolverParameter.clip_gradients semantics (io/caffe.export_solver): the
    whole update rescales when the global grad L2 norm exceeds the threshold —
    without it, one outlier batch NaNs a 3C-decomposed finetune."""
    import jax.numpy as jnp
    import optax

    from channel_pruning_tpu.train.finetune import make_optimizer
    from channel_pruning_tpu.utils.config import FinetuneConfig

    params = {"conv": {"W": jnp.zeros((4, 4))}}
    huge = {"conv": {"W": jnp.full((4, 4), 1e6)}}
    cfg = FinetuneConfig(base_lr=1.0, momentum=0.0, clip_gradients=1.0)
    opt = make_optimizer(cfg)
    upd, _ = opt.update(huge, opt.init(params), params)
    gnorm = float(jnp.linalg.norm(upd["conv"]["W"]))
    assert gnorm <= 1.0 + 1e-5, gnorm

    # off by default: the update is the (scaled) raw gradient
    cfg0 = FinetuneConfig(base_lr=1.0, momentum=0.0)
    opt0 = make_optimizer(cfg0)
    upd0, _ = opt0.update(huge, opt0.init(params), params)
    assert float(jnp.linalg.norm(upd0["conv"]["W"])) > 1e5

    # and it renders into the exported solver.prototxt
    from channel_pruning_tpu.io.caffe import export_solver
    assert "clip_gradients: 1" in export_solver(cfg, "net.prototxt")


def test_solve_3c_on_mesh_matches_single_device(mesh):
    """The WHOLE 3C pass (VH spatial + ITQ channel decomposition + pruning
    arm) on an 8-device mesh: frontier image axis sharded, solver
    reductions partitioned by GSPMD — channel selections must be exactly
    the single-device ones and the VH/ITQ reconstruction errors must agree
    (the r4 gap: 3C had zero multi-device evidence; SURVEY §2.3/§5 —
    sample-dimension sharding covers ALL solver matrices)."""
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import freeze
    from channel_pruning_tpu.utils.config import default_config

    g, params = build_tiny_vgg(batch=4, image_size=16)
    g = split_relu(g)
    rng = np.random.default_rng(13)
    inputs = rng.normal(0, 1, (8, 4, 3, 16, 16)).astype(np.float32)
    cache = freeze(g, to_device_params(params), inputs, n_points=6, seed=0,
                   chunk_batches=4)
    ranks = {"conv1_2": 6, "conv2_1": 8, "conv2_2": 9}
    cfg = default_config()

    r_mesh = c3.solve_3c(g, params, cache, cfg, ranks, mesh=mesh,
                         verbose=False)
    r_solo = c3.solve_3c(g, params, cache, cfg, ranks, verbose=False)

    assert not r_mesh.itq_degraded and not r_mesh.undecomposed
    assert set(r_mesh.selections) == set(r_solo.selections)
    for k in r_solo.selections:
        np.testing.assert_array_equal(r_mesh.selections[k],
                                      r_solo.selections[k]), k
    # decomposition telemetry (relu rel-error of VH-only and final VH+ITQ
    # responses) agrees — GSPMD's psum reduction order may differ from the
    # single-device sum, so low-order-bit drift is allowed, divergence isn't
    solo = {(r.conv, r.rank): r for r in r_solo.reports}
    for r in r_mesh.reports:
        s = solo[(r.conv, r.rank)]
        np.testing.assert_allclose(r.rmse_before, s.rmse_before,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(r.rmse_after, s.rmse_after,
                                   rtol=1e-4, atol=1e-6)
    r_mesh.graph.validate()
