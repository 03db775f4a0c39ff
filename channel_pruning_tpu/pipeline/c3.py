"""Whole-model compression drivers: the c3 pipeline and its solve passes.

Reference mapping (lib/train.py:25-100, lib/net.py:1292-1471 R3):

  step0  -> `preprocess`: BN fold + ReLU split (pure rewrites)
  step1  -> `sampling.freeze`: calibration snapshot of the ORIGINAL net
  solve  -> `solve_prune` (channel-pruning-only, the ICCV'17 "5x" model) or
            `solve_3c` (spatial SVD + ITQ channel decomposition + pruning,
            the "3C 4x" model)
  stepend-> nothing: weights are applied to the output graph as we go (there
            is no WPQ dict to flush — graph and params stay consistent by
            construction).

TPU-first redesign of the solve loop: the reference mutates the live caffe
net's topology implicitly via prototxt surgery applied later; we instead keep
TWO graphs —

  * `g_run` — the RUNNING graph: original topology, never restructured.
    Per-layer weight overwrites (low-rank VHr/W12 merges, zero-scattered
    pruned reconstructions) implement the asymmetric accumulated-error
    semantics (reference setConv, net.py:1333-1337,1370,1391) while keeping
    every activation shape static — so the entire multi-hundred-layer solve
    reuses ONE compiled XLA replay program per (graph, capture) signature,
    with weights as traced arguments. No recompiles, no shape churn.
  * `g_out` — the OUTPUT graph: physically decomposed/pruned (V/H/P inserts,
    channel-sliced weights), built incrementally with pure rewrites.

Ground-truth targets always come from the frozen cache of the original net;
patch/response extraction always replays `g_run` — exactly the reference's
asymmetric reconstruction ordering (SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

import functools
import math
import os
import time
from dataclasses import dataclass, field
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.graph import rewrite
from channel_pruning_tpu.graph.ir import Graph, LT
from channel_pruning_tpu.ops import lowrank
from channel_pruning_tpu.ops.forward import to_device_params
from channel_pruning_tpu.pipeline import prune as prune_mod
from channel_pruning_tpu.sampling import rolling as rolling_mod
from channel_pruning_tpu.sampling import sampler as sampling
from channel_pruning_tpu.utils.config import Config
from channel_pruning_tpu.utils.timers import Timer

# CP_TPU_PHASE_TIMING=1 prints fenced per-phase timings in the 3C decompose
# loop (attribution only: the block_until_ready fences it inserts serialise
# device work that normally overlaps with host bookkeeping)
_PHASE_TIMING = os.environ.get("CP_TPU_PHASE_TIMING", "") == "1"


def _phase_marker():
    """Fenced phase accumulator for CP_TPU_PHASE_TIMING runs; no-op (and no
    device syncs) otherwise. Returns (mark, report) closures."""
    if not _PHASE_TIMING:
        return (lambda name, *vals: None), (lambda tag: None)
    acc: dict[str, float] = {}
    t0 = [time.perf_counter()]

    def mark(name: str, *vals) -> None:
        for v in vals:
            if v is not None:
                jax.block_until_ready(v)
        now = time.perf_counter()
        acc[name] = acc.get(name, 0.0) + (now - t0[0])
        t0[0] = now

    def report(tag: str) -> None:
        parts = " ".join(f"{k}={v:.2f}s" for k, v in acc.items())
        print(f"[phase] {tag}: {parts}", flush=True)
        acc.clear()
        t0[0] = time.perf_counter()

    return mark, report


# ---------------------------------------------------------------------------
# step0: preprocess
# ---------------------------------------------------------------------------

def preprocess(graph: Graph, params: Mapping[str, Mapping[str, np.ndarray]]
               ) -> tuple[Graph, dict]:
    """BN fold + ReLU split (reference preprocess_resnet -> merge_bn +
    seperateConvReLU, lib/net.py:1277-1290)."""
    g, p = rewrite.merge_bn(graph, params)
    g = rewrite.split_relu(g)
    return g, p


# ---------------------------------------------------------------------------
# solve telemetry
# ---------------------------------------------------------------------------

@dataclass
class LayerReport:
    conv: str
    rank: int | None = None
    kept: int | None = None
    total: int | None = None
    alpha: float = 0.0
    rmse_before: float = 0.0
    rmse_after: float = 0.0
    seconds: float = 0.0


@dataclass
class SolveResult:
    graph: Graph                      # output (decomposed/pruned) graph
    params: dict                      # its parameters
    reports: list[LayerReport] = field(default_factory=list)
    selections: dict[str, np.ndarray] = field(default_factory=dict)
    # layers where the rolling frontier could not serve the request and a
    # full replay was used instead (performance-only degradation)
    frontier_fallbacks: list[str] = field(default_factory=list)
    # 3C layers where ITQ was rejected and the layer stayed at VH-only
    itq_degraded: list[str] = field(default_factory=list)
    # 3C layers kept completely untouched (spatial stage rejected too)
    undecomposed: list[str] = field(default_factory=list)

    def summary(self) -> str:
        lines = []
        for r in self.reports:
            sel = f"{r.kept}/{r.total}" if r.kept is not None else "-"
            rk = r.rank if r.rank is not None else "-"
            lines.append(f"{r.conv:>16s}  rank={rk!s:>4s} keep={sel:>9s} "
                         f"rMSE {r.rmse_before:.4f}->{r.rmse_after:.4f} "
                         f"({r.seconds:.2f}s)")
        if self.frontier_fallbacks:
            lines.append(f"frontier fallbacks ({len(self.frontier_fallbacks)}):"
                         f" {', '.join(self.frontier_fallbacks)}")
        if self.itq_degraded:
            lines.append(f"ITQ degraded to VH-only "
                         f"({len(self.itq_degraded)}): "
                         f"{', '.join(self.itq_degraded)}")
        if self.undecomposed:
            lines.append(f"kept undecomposed ({len(self.undecomposed)}): "
                         f"{', '.join(self.undecomposed)}")
        return "\n".join(lines)


def _scatter_inputs(W_kept: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """Zero-scatter a (n, kept, kh, kw) reconstruction back to full input
    width for the running graph (the reference zeroes removed channels in the
    live net, W2keep net.py:1610-1625)."""
    full = np.zeros((W_kept.shape[0], keep.shape[0]) + W_kept.shape[2:],
                    W_kept.dtype)
    full[:, keep] = W_kept
    return full


# ---------------------------------------------------------------------------
# channel-pruning-only solve (the "5x" pipeline)
# ---------------------------------------------------------------------------

def prune_targets_from_ratio(graph: Graph, speed_ratio: float,
                             skip: tuple[str, ...] = ()) -> dict[str, int]:
    """Uniform fallback when no per-layer target table is given: each
    producer conv keeps C_out/sqrt(speed_ratio) outputs (both sides of a conv
    pair shrink, so pairwise FLOPs scale ~1/ratio). The released models use
    hand-tuned per-layer tables instead (models.vgg.VGG16_5X_CHANNELS)."""
    scale = 1.0 / math.sqrt(speed_ratio)
    targets: dict[str, int] = {}
    for c in graph.convs:
        if c in skip:
            continue
        n_out = int(graph.layer(c).attr("num_output"))
        targets[c] = max(1, int(round(n_out * scale)))
    return targets


def plan_uniform_targets(graph: Graph, speed_ratio: float,
                         rank_tol: float = 0.1,
                         skip: tuple[str, ...] = (),
                         with_prediction: bool = False):
    """Structure-aware uniform targets: bisect one keep fraction s so the
    SIMULATED post-prune conv-mult count hits 1/speed_ratio, accounting for
    (a) which producers can physically shrink (group-1 / depthwise chains,
    apply_pruning rules) vs gate-only input slicing at residual junctions,
    and (b) the support search landing at the TOP of the rank_tol band.
    `prune_targets_from_ratio`'s fixed 1/sqrt(speed) over-keeps on topologies
    where many outputs ride Eltwise sums (Xception measured 1.43x at
    speed=2.0; this planner hits the asked ratio on the same graph)."""
    from channel_pruning_tpu.graph.ir import shapes_of
    from channel_pruning_tpu.utils import flops as flops_mod

    convs = list(graph.convs)
    shapes = shapes_of(graph, batch=1)
    base = {c: flops_mod.layer_flops(graph, shapes, c) for c in convs}

    def simulate(s: float) -> tuple[float, dict[str, int]]:
        in_scale = {c: 1.0 for c in convs}
        out_scale = {c: 1.0 for c in convs}
        for i, c in enumerate(convs):
            if i == 0 or c in skip:
                continue
            prod = prune_mod.producer_conv(graph, graph.layer(c).bottoms[0],
                                           before=c)
            if prod is None or prod in skip:
                continue
            geo_c = graph.layer(c).conv_geometry()
            if geo_c["group"] > 1:
                continue                            # depthwise consumer: skip
            # DISCRETE top-of-band outcome for this edge: the support search
            # lands on the largest integer in [t, t + tol*t] — at 512-wide
            # convs that is ~t*(1+tol), at 9-wide ones it is exactly t
            # (int(0.1*9) == 0); a continuous s*(1+tol) over-predicts keeps
            # on tiny graphs by up to 10% per side
            n_prod = int(graph.layer(prod).attr("num_output"))
            t = max(1, int(round(n_prod * s)))
            keep = min(n_prod, t + int(rank_tol * t)) / n_prod
            in_scale[c] = keep
            # mirror apply_pruning's producer-shrink rules
            cons, p = c, prod
            while p is not None and prune_mod._sole_consumer_chain(
                    graph, p, cons):
                geo = graph.layer(p).conv_geometry()
                if geo["group"] == 1:
                    out_scale[p] = keep
                    break
                if geo["group"] == int(graph.layer(p).attr("num_output")):
                    out_scale[p] = keep             # depthwise: pass through
                    nxt = prune_mod.producer_conv(
                        graph, graph.layer(p).bottoms[0], before=p)
                    cons, p = p, nxt
                    continue
                break
        total = sum(base[c] * in_scale[c] * out_scale[c] for c in convs)
        targets = {c: max(1, int(round(
            int(graph.layer(c).attr("num_output")) * s)))
            for c in convs if c not in skip}
        return total, targets

    orig = sum(base.values())
    want = orig / speed_ratio
    # invariant: total(lo) <= want < total(hi); answer = largest s meeting
    # the ratio = lo
    lo, hi = 0.02, 1.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        total, _ = simulate(mid)
        if total > want:
            hi = mid
        else:
            lo = mid
    total, targets = simulate(lo)
    predicted = orig / max(total, 1)
    print(f"[plan] uniform keep fraction {lo:.3f} -> predicted "
          f"{predicted:.2f}x conv mults")
    if with_prediction:
        return targets, predicted
    return targets


def _maybe_rolling(g_run: Graph, cache: sampling.FrozenCache,
                   compute_dtype: str | None, mesh=None,
                   hbm_budget: int = 8 << 30):
    """Use the O(L) rolling frontier when the live activation cut over the
    whole calibration set fits HBM: the chain variant for plain nets, the
    DAG-cut variant for residual topologies. With a mesh the frontier's
    image axis is sharded, so the budget scales with the device count."""
    n_images = cache.n_batches * cache.batch_size
    if mesh is not None:
        hbm_budget *= int(mesh.devices.size)
    if rolling_mod.is_chain(g_run):
        if rolling_mod.estimate_peak_bytes(g_run, n_images) > hbm_budget:
            return None
        return rolling_mod.RollingReplay(g_run, cache.device_inputs(),
                                         compute_dtype=compute_dtype,
                                         mesh=mesh)
    if rolling_mod.estimate_cut_bytes(g_run, n_images) > hbm_budget:
        return None
    return rolling_mod.RollingReplayDAG(g_run, cache.device_inputs(),
                                        compute_dtype=compute_dtype,
                                        mesh=mesh)


def _epscheck(*arrays, warn: float = 1e2, reject: float = 1e4) -> bool:
    """Numeric guard on decomposition factors (reference epscheck,
    lib/decompose.py:158-161: warns at 1e2/1e4). Returns False when a factor
    is non-finite or beyond `reject` — the caller reverts the layer."""
    worst = 0.0
    for a in arrays:
        a = np.asarray(a)
        if not np.isfinite(a).all():
            return False
        worst = max(worst, float(np.abs(a).max()))
    if worst > reject:
        return False
    if worst > warn:
        print(f"[epscheck] factor magnitude {worst:.1e} exceeds {warn:.0e}")
    return True


@jax.jit
def _relu_rel_error(gt, pred):
    """rel_error(relu(gt), relu(pred)) on device — only the scalar crosses
    the link (the 3C telemetry previously fetched two (N, n) response
    matrices per layer)."""
    g = jnp.maximum(gt.astype(jnp.float32), 0.0)
    p = jnp.maximum(pred.astype(jnp.float32), 0.0)
    return jnp.sqrt(jnp.mean((g - p) ** 2)) / \
        jnp.sqrt(jnp.mean(g ** 2) + 1e-30)


@jax.jit
def _absmax_finite(x):
    """max|x| and its finiteness as device scalars (NaN/Inf propagate
    through the max) — the device-side epscheck probe."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return ax, jnp.isfinite(ax)


def _epscheck_device(x, warn: float = 1e2, reject: float = 1e4) -> bool:
    """_epscheck semantics with the reduction on device: only two scalars
    cross the link instead of the whole array (the 3C input probe used to
    fetch the ~92 MB patch matrix per layer just to take |max|)."""
    ax, fin = _absmax_finite(jnp.asarray(x))
    if not bool(fin):
        return False
    ax = float(ax)
    if ax > reject:
        return False
    if ax > warn:
        print(f"[epscheck] factor magnitude {ax:.1e} exceeds {warn:.0e}")
    return True


def _residual_context(g_run: Graph, consumer_top: str):
    """If `consumer_top` feeds an Eltwise sum, return (eltwise top, other
    bottom tensors) — the residual-compensation context (reference appresb,
    lib/net.py:1641-1683)."""
    for e in g_run.by_type(LT.ELTWISE):
        if consumer_top in e.bottoms and e.attr("operation", "sum") == "sum":
            return e.tops[0], tuple(b for b in e.bottoms if b != consumer_top)
    return None, ()


class _PipelineDegenerate(RuntimeError):
    """The async pipelined pass hit a layer the fused solve cannot serve
    (empty selection needing the magnitude fallback); the caller restarts
    the solve on the sequential path."""


def _pipelined_conv_pass(g_run: Graph, p_run, dev_run, g_out, p_out,
                         selections, reports, cache: sampling.FrozenCache,
                         cfg: Config, channel_targets, roll, checkpoint,
                         resume_i: int, verbose: bool, mesh=None,
                         frontier_fallbacks: list[str] | None = None,
                         input_targets=None, residual_compensate: bool = True):
    """Async-pipelined conv pass (VERDICT r3 #5; DAG topologies r4 #1): the
    per-layer device chain — frontier advance → patch gather → fused
    whole-layer solve — is dispatched WITHOUT any host synchronisation
    between layers. Serves BOTH frontier kinds: the chain `RollingReplay`
    (VGG/plain nets) and the DAG-cut `RollingReplayDAG` (residual
    topologies — ResNet/Xception/Faster-RCNN), including

      * gate-only consumers (`input_targets`: Select/Filter gates at
        residual junctions, reference net.py:1627-1630) — same fused
        solve, the output-graph application just skips the producer
        shrink, and
      * residual compensation (reference appresb, net.py:1641-1683):
        Y = gt(block) − Σ current(other bottoms) − b is built ENTIRELY on
        device from the frontier's live cut (`features_at(device=True)`),
        so block-ending consumers stay on the async path too.

      * every layer's solve is zero-padded to one (c_pad, n_pad) bucket per
        kernel-size class, so the whole model shares ONE compiled fused-solve
        program per class (the from-scratch VGG-16 run previously paid 7
        fused-solve compiles of 10-37 s each — the dominant cost of a cold
        solve phase). Zero-padded channels are arithmetically inert: the CD
        kernel guards zero diagonals (kernels/lasso_cd.py:46), appended zero
        Gram rows/columns never enter the support or perturb the real block's
        Cholesky elimination, and the trim/top-up tie-breaks are stable
        argsorts that prefer lower (real) indices — selections are identical
        to the unpadded sequential pass (tests/test_pipeline.py pins this);
      * the running weights are updated DEVICE-to-DEVICE from the fused
        solve's full-width masked reconstruction (`Wfull` IS the
        zero-scattered running weight `_scatter_inputs` builds on host), so
        the next layer's frontier advance enqueues behind the solve with no
        d2h fetch, host scatter, or h2d re-upload on the critical path;
      * host-side bookkeeping (report fetch, output-graph surgery,
        checkpointing) trails ONE layer behind the device queue, overlapping
        the d2h of layer i's weights with layer i+1's compute.

    Matches the reference's per-layer semantics exactly (asymmetric
    accumulated error, lib/net.py:1333-1337): the frontier advances through
    layer i with its RECONSTRUCTED weights before layer i+1 samples.
    Raises _PipelineDegenerate when a layer needs the magnitude fallback.
    """
    import collections

    from channel_pruning_tpu.pipeline.prune import (PruneResult,
                                                    _fused_layer_solve)
    from channel_pruning_tpu.utils import runtime

    convs = list(g_run.convs)
    ct = channel_targets or {}
    items = []
    for i, consumer in enumerate(convs):
        if i <= resume_i:
            continue
        bottom = g_run.layer(consumer).bottoms[0]
        producer = prune_mod.producer_conv(g_run, bottom, before=consumer)
        # target resolution mirrors the sequential loop exactly: gate-only
        # (consumer-keyed) targets first, then producer-keyed shrink targets
        target = None
        gate_only = False
        if input_targets is not None and consumer in input_targets:
            target = input_targets[consumer]
            gate_only = True
        elif producer is not None and i > 0:
            target = ct.get(producer)
        if target is None:
            continue
        n_in = p_run[consumer]["W"].shape[1]
        if target >= n_in:
            continue
        items.append((i, consumer, bottom, int(target), gate_only))
    if not items:
        return g_out, p_out, dev_run

    # one (c_pad, n_pad) bucket per kernel-size class -> one compile each
    geos = {c: g_run.layer(c).conv_geometry() for _, c, _, _, _ in items}
    classes: dict[tuple[int, int], list[int]] = {}
    for _, consumer, _, _, _ in items:
        geo = geos[consumer]
        cls = classes.setdefault((geo["kh"], geo["kw"]), [0, 0])
        cls[0] = max(cls[0], p_run[consumer]["W"].shape[1])
        cls[1] = max(cls[1], p_run[consumer]["W"].shape[0])

    top0 = g_run.layer(items[0][1]).tops[0]
    N = int(np.asarray(cache.feats[top0]).shape[0])
    n_sub = min(cfg.lasso.subsample_rows, max(N // 20, 1))
    rows = np.random.default_rng(cfg.sample.seed).integers(0, N, size=n_sub)
    rows_d = jnp.asarray(rows)

    # with a mesh, pin the solver inputs row-sharded so GSPMD partitions the
    # fused program's big reductions (Z/Gram/normal equations psum over ICI)
    # instead of all-gathering X to every device — same SPMD plan as the
    # sequential sharded path (parallel/sharded.py); selections are
    # identical either way (dryrun_multichip asserts this)
    row_sharded = None
    if mesh is not None and mesh.devices.size > 1:
        from channel_pruning_tpu.parallel import mesh as mesh_mod
        row_sharded = mesh_mod.batch_sharded(mesh)

    # prefetch every layer's ground-truth features NOW: device_put is async,
    # so the tunnel streams these h2d transfers behind the first layers'
    # frontier compute instead of each upload stalling its layer's dispatch
    # (BENCH_NOTES: first-layer costs included the serial gt-feature uploads)
    feats_dev: dict[str, jnp.ndarray] = {}
    for _, consumer, _, _, _ in items:
        top = g_run.layer(consumer).tops[0]
        e_top, _ = (_residual_context(g_run, top) if residual_compensate
                    else (None, ()))
        t = e_top if (e_top is not None and e_top in cache.feats) else top
        if t not in feats_dev and t in cache.feats:
            feats_dev[t] = runtime.chunked_device_put(
                np.asarray(cache.feats[t], np.float32))
    pending: collections.deque = collections.deque()

    def drain_one():
        nonlocal g_out, p_out
        i, consumer, out, n_in, n_out, gate_only, t0 = pending.popleft()
        keep = np.asarray(out[0])[:n_in]
        if keep.sum() == 0:
            raise _PipelineDegenerate(
                f"{consumer}: empty fused selection (magnitude fallback "
                f"needed)")
        Wfull = np.asarray(out[3], np.float32)[:n_out, :n_in]
        b = np.asarray(out[4], np.float32)[:n_out]
        res = PruneResult(keep=keep.astype(bool), W=Wfull[:, keep.astype(bool)],
                          b=b, alpha=float(out[1]),
                          rmse_before=float(out[5]), rmse_after=float(out[6]))
        p_run[consumer]["W"] = Wfull      # == _scatter_inputs(res.W, keep)
        p_run[consumer]["b"] = b
        g_out, p_out = prune_mod.apply_pruning(g_out, p_out, consumer, res,
                                               shrink_producer=not gate_only)
        selections[consumer] = res.keep
        dt = time.perf_counter() - t0
        reports.append(LayerReport(
            conv=consumer, kept=int(res.keep.sum()), total=int(n_in),
            alpha=res.alpha, rmse_before=res.rmse_before,
            rmse_after=res.rmse_after, seconds=dt))
        if verbose:
            kind = "gate" if gate_only else "prune"
            print(f"[{kind}] {consumer}: keep {int(res.keep.sum())}/{n_in} "
                  f"rMSE {res.rmse_before:.4f}->{res.rmse_after:.4f} "
                  f"({dt:.2f}s pipelined)")
        if checkpoint is not None:
            checkpoint.maybe_save(i, {"p_run": p_run, "g_out": g_out,
                                      "p_out": p_out,
                                      "selections": selections,
                                      "reports": reports,
                                      "frontier_fallbacks":
                                          list(frontier_fallbacks or [])})

    diag: list[tuple[str, float, float, float]] = []
    for i, consumer, bottom, target, gate_only in items:
        runtime.heartbeat()
        t0 = time.perf_counter()
        try:
            roll.advance_to(dev_run, bottom)
            X = roll.patches_at(cache.plan, consumer).astype(jnp.float32)
        except rolling_mod.FrontierError as exc:
            # non-monotone bottom / tensor off the cut: the sequential path
            # has a full-replay fallback — restart there
            raise _PipelineDegenerate(f"{consumer}: frontier fallback "
                                      f"needed ({exc})")
        # rows_d was drawn once against the FIRST layer's row count; a
        # mismatched layer would silently clamp gather indices and diverge
        # from the sequential pass (make_point_plan is uniform, so this
        # never fires in practice — it guards the invariant)
        assert X.shape[0] == N, (consumer, X.shape[0], N)
        if _PHASE_TIMING:
            # fenced attribution (perturbs the overlap this pass exists for —
            # diagnostics only): advance+gather = the frontier's conv replay
            # over the calibration set, the MXU-bound part of the chain
            X = jax.block_until_ready(X)
            t_adv = time.perf_counter() - t0
        top = g_run.layer(consumer).tops[0]
        n_in = p_run[consumer]["W"].shape[1]
        n_out = p_run[consumer]["W"].shape[0]
        geo = geos[consumer]
        c_pad, n_pad = classes[(geo["kh"], geo["kw"])]
        W2d = jnp.asarray(dev_run[consumer]["W"], jnp.float32)
        b2d = dev_run[consumer].get("b")
        b2d = (jnp.asarray(b2d, jnp.float32) if b2d is not None
               else jnp.zeros((n_out,), jnp.float32))
        e_top, others = (_residual_context(g_run, top) if residual_compensate
                         else (None, ()))
        if e_top is not None and e_top in cache.feats:
            # residual compensation, fully on device: fit the branch so the
            # BLOCK output matches ground truth (identical expression order
            # to the sequential path — bit-identical Y)
            if e_top not in feats_dev:
                feats_dev[e_top] = runtime.chunked_device_put(
                    np.asarray(cache.feats[e_top], np.float32))
            Yd = feats_dev[e_top] - b2d[None, :]
            try:
                for o in others:
                    Yd = Yd - roll.features_at(dev_run, cache.plan, o,
                                               device=True)
            except rolling_mod.FrontierError as exc:
                raise _PipelineDegenerate(f"{consumer}: residual features "
                                          f"fallback needed ({exc})")
        else:
            if top not in feats_dev:
                feats_dev[top] = runtime.chunked_device_put(
                    np.asarray(cache.feats[top], np.float32))
            Yd = feats_dev[top] - b2d[None, :]
        if n_in < c_pad:
            X = jnp.pad(X, ((0, 0), (0, c_pad - n_in), (0, 0), (0, 0)))
            W2d = jnp.pad(W2d, ((0, 0), (0, c_pad - n_in), (0, 0), (0, 0)))
        if n_out < n_pad:
            W2d = jnp.pad(W2d, ((0, n_pad - n_out), (0, 0), (0, 0), (0, 0)))
            Yd = jnp.pad(Yd, ((0, 0), (0, n_pad - n_out)))
        if row_sharded is not None:
            X = jax.device_put(X, row_sharded)
            Yd = jax.device_put(Yd, row_sharded)
        if _PHASE_TIMING:
            Yd = jax.block_until_ready(Yd)
            t_tgt = time.perf_counter() - t0 - t_adv
        out = _fused_layer_solve(
            X, W2d, Yd, rows_d, jnp.int32(target), float(cfg.dic.rank_tol),
            float(cfg.solve.alpha), cfg.lasso.grid_size, cfg.lasso.max_rounds,
            cfg.lasso.n_sweeps, cfg.solve.band, float(cfg.solve.ls_ridge))
        if _PHASE_TIMING:
            out = jax.block_until_ready(out)
            t_solve = time.perf_counter() - t0 - t_adv - t_tgt
            diag.append((consumer, t_adv, t_tgt, t_solve))
            print(f"[fenced-diag] {consumer}: advance+gather {t_adv:.2f}s "
                  f"target-build {t_tgt:.2f}s fused-solve {t_solve:.2f}s")
        # device-to-device running update: NO host sync before the next
        # layer's frontier advance
        dev_run = dict(dev_run)
        dev_run[consumer] = {"W": out[3][:n_out, :n_in], "b": out[4][:n_out]}
        pending.append((i, consumer, out, n_in, n_out, gate_only, t0))
        while len(pending) > 1:
            drain_one()
    while pending:
        drain_one()
    if _PHASE_TIMING and diag:
        tot = [sum(d[k] for d in diag) for k in (1, 2, 3)]
        print(f"[fenced-diag] totals over {len(diag)} layers: "
              f"advance+gather {tot[0]:.1f}s target-build {tot[1]:.1f}s "
              f"fused-solve {tot[2]:.1f}s (fenced run — the async pass "
              f"overlaps these with host bookkeeping)")
    return g_out, p_out, dev_run


def _flush_checkpoint_on_error(fn):
    """Checkpoint writes are async (checkpoint.SolveCheckpoint); a crash
    escaping the solve driver must not outrun the in-flight snapshot —
    join it before propagating so the resume contract (last completed
    save is on disk) holds on every exception path."""
    @functools.wraps(fn)
    def wrapper(*args, checkpoint=None, **kwargs):
        try:
            return fn(*args, checkpoint=checkpoint, **kwargs)
        except BaseException:
            if checkpoint is not None:
                checkpoint.wait()
            raise
    return wrapper


@_flush_checkpoint_on_error
def solve_prune(graph: Graph, params: Mapping[str, Mapping[str, np.ndarray]],
                cache: sampling.FrozenCache, cfg: Config,
                channel_targets: Mapping[str, int] | None = None,
                input_targets: Mapping[str, int] | None = None,
                residual_compensate: bool = True,
                checkpoint=None, mesh=None,
                verbose: bool = True, _no_pipeline: bool = False) -> SolveResult:
    """Sequential whole-model channel pruning (reference R3's pruning arm,
    per-layer loop net.py:1406-1459).

    * `channel_targets` maps a PRODUCER conv to its surviving output-channel
      count (e.g. models.vgg.VGG16_5X_CHANNELS): the producer is pruned by
      LASSO-selecting its consumer's input channels and physically shrunk.
    * `input_targets` maps a CONSUMER conv to its surviving input count when
      the producer is NOT shrinkable (residual junctions): a Select/Filter
      gate is inserted instead (reference Filter layers,
      temp/resnet-50-cp.prototxt; net.py:1627-1630).
    * With `residual_compensate`, a consumer feeding an Eltwise sum is fit
      against `gt(block) − current(shortcut)` so the whole block output is
      reconstructed (reference appresb, net.py:1641-1683).

    Chain graphs with a calibration set that fits HBM use the O(L) rolling
    frontier (sampling/rolling.py) instead of O(L^2) full replays.
    """
    timer = Timer()
    g_run = graph
    p_run = {k: dict(v) for k, v in params.items()}
    g_out = graph
    p_out = {k: dict(v) for k, v in params.items()}
    reports: list[LayerReport] = []
    selections: dict[str, np.ndarray] = {}
    frontier_fallbacks: list[str] = []
    resume_i = -1
    if checkpoint is not None:
        snap = checkpoint.load()
        if snap is not None:
            resume_i, st = snap
            p_run, g_out, p_out = st["p_run"], st["g_out"], st["p_out"]
            selections = st["selections"]
            reports = st["reports"]
            frontier_fallbacks = st.get("frontier_fallbacks", [])
            print(f"[resume] solve_prune continuing after layer {resume_i}")
    chunk = sampling.clamp_chunk_for_hbm(
        g_run, cache.batch_size,
        max(cfg.sample.device_batch // cache.batch_size, 1))
    cdt = None if cfg.solve.dtype == "float32" else cfg.solve.dtype
    # device-resident running params, updated INCREMENTALLY per layer —
    # re-uploading the whole pytree each layer would move ~0.5 GB/layer for
    # VGG-16 over the host<->TPU link. With fitfc off the replay never runs
    # the FC stack, so fc6/7/8 (~470 MB of VGG-16's 528 MB) stay off the
    # link entirely — mirroring the freeze-side skip (freeze_tensor_set)
    dev_src = p_run
    if not (cfg.dic.fitfc and channel_targets):
        fcs = set(g_run.fcs)
        dev_src = {k: v for k, v in p_run.items() if k not in fcs}
    dev_run = to_device_params(dev_src)
    feats_dev: dict[str, jnp.ndarray] = {}  # ground-truth targets, uploaded once
    roll = _maybe_rolling(g_run, cache, cdt, mesh=mesh)

    convs = list(g_run.convs)
    # the fused single-task solve cannot serve a 1x1 consumer when grplasso
    # is on (select_and_reconstruct routes those through the row-sparse
    # group lasso, mirroring the reference's MultiTaskLasso gate,
    # decompose.py:439-444) — such layers must take the sequential path
    grpl_block = cfg.dic.grplasso and any(
        g_run.layer(c).conv_geometry()["kh"]
        * g_run.layer(c).conv_geometry()["kw"] == 1
        for c in convs)
    skip_convs = False
    if (not _no_pipeline and roll is not None
            and cfg.solve.fused_search and not grpl_block
            and not cfg.solve.autodet
            and (channel_targets or input_targets)):
        try:
            g_out, p_out, dev_run = _pipelined_conv_pass(
                g_run, p_run, dev_run, g_out, p_out, selections, reports,
                cache, cfg, channel_targets, roll, checkpoint, resume_i,
                verbose, mesh=mesh, frontier_fallbacks=frontier_fallbacks,
                input_targets=input_targets,
                residual_compensate=residual_compensate)
            skip_convs = True
        except _PipelineDegenerate as exc:
            print(f"[pipeline] {exc}; restarting on the sequential path")
            roll = dev_run = None  # release the frontier before rebuilding
            return solve_prune(graph, params, cache, cfg,
                               channel_targets=channel_targets,
                               input_targets=input_targets,
                               residual_compensate=residual_compensate,
                               checkpoint=checkpoint, mesh=mesh,
                               verbose=verbose, _no_pipeline=True)
    # shared fused-solve pad bucket per kernel-size class (compile-count
    # discipline, see _pipelined_conv_pass): the sequential path — residual
    # topologies like ResNet/Xception — otherwise compiles one fused-solve
    # program per distinct (c, n) layer shape (~20 distinct shapes on
    # ResNet-50, 10-30 s each on a cold cache)
    pad_buckets: dict[tuple[int, int], list[int]] = {}
    for _c in convs:
        _g = g_run.layer(_c).conv_geometry()
        _w = p_run[_c]["W"].shape
        _b = pad_buckets.setdefault((_g["kh"], _g["kw"]), [0, 0])
        _b[0] = max(_b[0], _w[1])
        _b[1] = max(_b[1], _w[0])
    for i, consumer in enumerate(convs):
        if skip_convs:
            break
        if i <= resume_i:
            continue
        bottom = g_run.layer(consumer).bottoms[0]
        producer = prune_mod.producer_conv(g_run, bottom, before=consumer)
        target = None
        gate_only = False
        if input_targets is not None and consumer in input_targets:
            target = input_targets[consumer]
            gate_only = True
        elif channel_targets is not None and producer is not None and i > 0:
            target = channel_targets.get(producer)
        if target is None:
            continue
        n_in = p_run[consumer]["W"].shape[1]
        if target >= n_in:
            continue
        timer.tic()
        t_ph = time.perf_counter()
        X = None
        if roll is not None:
            try:
                roll.advance_to(dev_run, bottom)
                X = roll.patches_at(cache.plan, consumer)
            except rolling_mod.FrontierError as exc:
                # non-monotone bottom: full replay (perf-only degradation)
                print(f"[rolling] fallback for {consumer}: {exc}")
                frontier_fallbacks.append(consumer)
        if X is None:
            X = sampling.sample_patches(g_run, dev_run, cache.device_inputs(), consumer,
                                        cache.plan, chunk_batches=chunk,
                                        compute_dtype=cdt, mesh=mesh)
        top = g_run.layer(consumer).tops[0]
        b2 = p_run[consumer].get("b", np.zeros(p_run[consumer]["W"].shape[0],
                                               np.float32))
        e_top, others = (_residual_context(g_run, top) if residual_compensate
                         else (None, ()))
        if e_top is not None and e_top in cache.feats:
            # fit the branch so the BLOCK output matches ground truth:
            # Y = gt(block) − b − Σ current(other bottoms), computed ON
            # DEVICE in f32 with the same expression order as the pipelined
            # pass (bit-identical targets either way; the reference does
            # this subtraction on f32 caffe blobs, net.py:1641-1683)
            cur = None
            if roll is not None:
                try:
                    cur = {o: roll.features_at(dev_run, cache.plan, o,
                                               device=True)
                           for o in others}
                except rolling_mod.FrontierError as exc:
                    print(f"[rolling] features fallback for {consumer}: {exc}")
                    frontier_fallbacks.append(f"{consumer}(features)")
            if cur is None:
                cur = sampling.sample_features(g_run, dev_run, cache.device_inputs(),
                                               cache.plan, others,
                                               chunk_batches=chunk,
                                               compute_dtype=cdt, mesh=mesh)
            if e_top not in feats_dev:
                feats_dev[e_top] = sampling.chunked_device_put(
                    np.asarray(cache.feats[e_top], np.float32))
            Y = feats_dev[e_top] - jnp.asarray(b2, jnp.float32)[None, :]
            for o in others:
                Y = Y - jnp.asarray(cur[o], jnp.float32)
        else:
            # chain path: subtract the bias ON DEVICE against a cached upload
            # of the ground truth — the (N, n) target would otherwise be a
            # fresh ~100 MB h2d per layer (identical f32 math either way)
            if top not in feats_dev:
                feats_dev[top] = sampling.chunked_device_put(
                    np.asarray(cache.feats[top], np.float32))
            Y = feats_dev[top] - jnp.asarray(b2, jnp.float32)
        t_solve = time.perf_counter()
        res = prune_mod.select_and_reconstruct(
            X, p_run[consumer]["W"], Y, int(target),
            rank_tol=cfg.dic.rank_tol, alpha0=cfg.solve.alpha,
            subsample=cfg.lasso.subsample_rows, n_sweeps=cfg.lasso.n_sweeps,
            grid_size=cfg.lasso.grid_size, max_rounds=cfg.lasso.max_rounds,
            ridge=cfg.solve.ls_ridge, seed=cfg.sample.seed, mesh=mesh,
            group=cfg.dic.grplasso, prefer=cfg.solve.band,
            fused=cfg.solve.fused_search,
            autodet=cfg.solve.autodet, layeralpha=cfg.dic.layeralpha,
            pad_to=tuple(pad_buckets[(
                g_run.layer(consumer).conv_geometry()["kh"],
                g_run.layer(consumer).conv_geometry()["kw"])]))
        dt = timer.toc()
        t_solve_s = time.perf_counter() - t_solve

        # running graph: zero-scattered reconstruction (static shapes)
        p_run[consumer]["W"] = _scatter_inputs(res.W, res.keep)
        p_run[consumer]["b"] = res.b
        dev_run = dict(dev_run)
        dev_run[consumer] = {k: jnp.asarray(v) for k, v in p_run[consumer].items()}
        # output graph: physical shrink, or Select gate at junctions
        g_out, p_out = prune_mod.apply_pruning(
            g_out, p_out, consumer, res, shrink_producer=not gate_only)
        selections[consumer] = res.keep
        reports.append(LayerReport(
            conv=consumer, kept=int(res.keep.sum()), total=int(n_in),
            alpha=res.alpha, rmse_before=res.rmse_before,
            rmse_after=res.rmse_after, seconds=dt))
        if verbose:
            kind = "gate" if gate_only else "prune"
            print(f"[{kind}] {consumer}: keep {int(res.keep.sum())}/{n_in} "
                  f"rMSE {res.rmse_before:.4f}->{res.rmse_after:.4f} ({dt:.2f}s"
                  f" = replay {t_solve - t_ph:.2f} + solve {t_solve_s:.2f})")
        if checkpoint is not None:
            checkpoint.maybe_save(i, {"p_run": p_run, "g_out": g_out,
                                      "p_out": p_out,
                                      "selections": selections,
                                      "reports": reports,
                                      "frontier_fallbacks": frontier_fallbacks})

    if checkpoint is not None:
        checkpoint.clear()

    # ---- FC consumers (dic.fitfc path, lib/cfgs.py:73): prune the last
    # conv's output channels via the first FC layer's inputs ----------------
    if cfg.dic.fitfc and channel_targets:
        for fc in g_run.fcs:
            bottom = g_run.layer(fc).bottoms[0]
            producer = prune_mod.producer_conv(g_run, bottom)
            target = channel_targets.get(producer) if producer else None
            if target is None:
                continue
            timer.tic()
            dense = sampling.sample_dense(g_run, dev_run, cache.device_inputs(),
                                          (bottom,), chunk_batches=chunk)[bottom]
            # FC weight (out, C*H*W) reshaped to channel-major (out, C, H, W)
            Wfc = np.asarray(p_run[fc]["W"], np.float32)
            C = dense.shape[1]
            Wr = Wfc.reshape(Wfc.shape[0], C, *dense.shape[2:])
            n_in = C
            if target >= n_in:
                continue
            top = g_run.layer(fc).tops[0]
            bfc = p_run[fc].get("b", np.zeros(Wfc.shape[0], np.float32))
            Y = cache.feats[top] - bfc
            res = prune_mod.select_and_reconstruct(
                dense, Wr, Y, int(target), rank_tol=cfg.dic.rank_tol,
                alpha0=cfg.solve.alpha, subsample=cfg.lasso.subsample_rows,
                n_sweeps=cfg.lasso.n_sweeps, grid_size=cfg.lasso.grid_size,
                max_rounds=cfg.lasso.max_rounds, ridge=cfg.solve.ls_ridge,
                seed=cfg.sample.seed, group=True, mesh=mesh,
                prefer=cfg.solve.band)  # group path has no fused variant
            dt = timer.toc()
            # running graph: zero-scatter back into the flat FC weight
            Wfull = np.zeros_like(Wr)
            Wfull[:, res.keep] = res.W
            p_run[fc]["W"] = Wfull.reshape(Wfc.shape)
            p_run[fc]["b"] = res.b
            dev_run = dict(dev_run)
            dev_run[fc] = {k: jnp.asarray(v) for k, v in p_run[fc].items()}
            # output graph: shrink the producer conv + slice the FC weight
            if producer is not None and prune_mod._sole_consumer_chain(
                    g_out, producer, fc):
                g_out, p_out = rewrite.prune_conv_outputs(g_out, p_out,
                                                          producer, res.keep)
                p_out[fc] = dict(p_out[fc])
                p_out[fc]["W"] = res.W.reshape(Wfc.shape[0], -1)
                p_out[fc]["b"] = res.b
            selections[fc] = res.keep
            reports.append(LayerReport(
                conv=fc, kept=int(res.keep.sum()), total=int(n_in),
                alpha=res.alpha, rmse_before=res.rmse_before,
                rmse_after=res.rmse_after, seconds=dt))
            if verbose:
                print(f"[fitfc] {fc}: keep {int(res.keep.sum())}/{n_in} "
                      f"rMSE {res.rmse_before:.4f}->{res.rmse_after:.4f}")
            break  # only the first FC consumes conv channels

    if frontier_fallbacks:
        print(f"[rolling] {len(frontier_fallbacks)} frontier fallback(s): "
              f"{', '.join(frontier_fallbacks)}")
    return SolveResult(graph=g_out, params=p_out, reports=reports,
                       selections=selections,
                       frontier_fallbacks=frontier_fallbacks)


# ---------------------------------------------------------------------------
# 3C solve: spatial (VH) + channel (ITQ) decomposition + pruning
# ---------------------------------------------------------------------------

def ranks_for_speed(base_ranks: Mapping[str, int], speed_ratio: float,
                    no_rescale_prefix: str = "conv5") -> dict[str, int]:
    """Scale the 4x rank table by 4/speed_ratio, conv5 exempt
    (reference net.py:1323-1326)."""
    out = {}
    for k, v in base_ranks.items():
        if k.startswith(no_rescale_prefix):
            out[k] = int(v)
        else:
            out[k] = max(1, int(round(v * 4.0 / speed_ratio)))
    return out


@_flush_checkpoint_on_error
def solve_3c(graph: Graph, params: Mapping[str, Mapping[str, np.ndarray]],
             cache: sampling.FrozenCache, cfg: Config,
             ranks: Mapping[str, int], skip: tuple[str, ...] = ("conv1_1",),
             checkpoint=None, mesh=None,
             verbose: bool = True) -> SolveResult:
    """The R3 whole-model 3C pass (lib/net.py:1292-1471).

    Per conv (in order, skipping `skip`):
      (a) spatial: data-driven VH SVD at rank r; running conv's weights
          overwritten with the rank-limited VHr (+ refit bias);
      (b) channel: ReLU-aware ITQ at rank r on the accumulated responses;
          running weights overwritten with the merged W12, bias B;
      (c) pruning: LASSO-select the NEXT conv's inputs down to
          C_out/c_ratio, least-squares reconstruct, zero-scatter into the
          running graph.
    The output graph replaces each conv with V (kh x 1) -> H (1 x kw, rank)
    -> P (1x1) and physically drops pruned channels (P rows of the producer,
    input slices of the consumer).
    """
    timer = Timer()
    g_run = graph
    p_run = {k: dict(v) for k, v in params.items()}
    g_out = graph
    p_out = {k: dict(v) for k, v in params.items()}
    reports: list[LayerReport] = []
    selections: dict[str, np.ndarray] = {}
    frontier_fallbacks: list[str] = []
    itq_degraded: list[str] = []
    undecomposed: list[str] = []
    # input-keep masks recorded by the pruning arm, consumed when the conv is
    # itself decomposed (V input channels sliced)
    input_keep: dict[str, np.ndarray] = {}
    resume_i = -1
    if checkpoint is not None:
        snap = checkpoint.load()
        if snap is not None:
            resume_i, st = snap
            p_run, g_out, p_out = st["p_run"], st["g_out"], st["p_out"]
            selections = st["selections"]
            input_keep = st["input_keep"]
            reports = st["reports"]
            frontier_fallbacks = st.get("frontier_fallbacks", [])
            itq_degraded = st.get("itq_degraded", [])
            undecomposed = st.get("undecomposed", [])
            print(f"[resume] solve_3c continuing after layer {resume_i}")

    convs = list(g_run.convs)
    chunk = sampling.clamp_chunk_for_hbm(
        g_run, cache.batch_size,
        max(cfg.sample.device_batch // cache.batch_size, 1))
    cdt = None if cfg.solve.dtype == "float32" else cfg.solve.dtype
    dev_run = to_device_params(p_run)   # incremental device copy (see solve_prune)
    feats_dev: dict[str, jnp.ndarray] = {}  # ground-truth targets, uploaded once
    roll = _maybe_rolling(g_run, cache, cdt, mesh=mesh)
    # shared fused-solve pad bucket per kernel-size class for the pruning
    # arm (same trick as the pipelined chain pass): the 3C consumers are
    # original-shape convs, so on VGG-16 all 11 arm solves ride the ONE
    # (512, 512, 3x3) compiled program the 5x pipeline also uses
    pad_buckets: dict[tuple[int, int], list[int]] = {}
    for _c in convs:
        _g = g_run.layer(_c).conv_geometry()
        _w = p_run[_c]["W"].shape
        _b = pad_buckets.setdefault((_g["kh"], _g["kw"]), [0, 0])
        _b[0] = max(_b[0], _w[1])
        _b[1] = max(_b[1], _w[0])
    # model-wide rank bucket: the VH refit / ITQ fold programs are shared by
    # every decomposed layer (see lowrank._vh_refit_fused — the eager
    # per-layer-shape chains they replace cost ~10 s of program build PER
    # LAYER through the axon stack, round-4 phase attribution)
    r_pad = -(-max(int(r) for r in ranks.values()) // 64) * 64 if ranks else 64

    def _sync(name: str) -> None:
        nonlocal dev_run
        dev_run = dict(dev_run)
        dev_run[name] = {k: jnp.asarray(v) for k, v in p_run[name].items()}

    _mark, _phase_report = _phase_marker()
    for i, conv in enumerate(convs):
        if i <= resume_i:
            continue
        if conv in skip or conv not in ranks:
            continue
        rank = int(ranks[conv])
        l_run = g_run.layer(conv)
        top = l_run.tops[0]
        geo = l_run.conv_geometry()
        W_cur = np.asarray(p_run[conv]["W"], np.float32)
        b_cur = np.asarray(p_run[conv].get("b", np.zeros(W_cur.shape[0])),
                           np.float32)
        n_out, c_full, kh, kw = W_cur.shape
        c_pad, n_pad = pad_buckets[(kh, kw)]
        _mark("host")
        # upload the ground truth pre-padded to the bucket width so every
        # layer shares the SAME device buffer shape (and the padded rmse /
        # refit programs — zero columns cancel in both)
        Ygt = np.asarray(cache.feats[top], np.float32)
        if Ygt.shape[1] < n_pad:
            Ygt = np.pad(Ygt, ((0, 0), (0, n_pad - Ygt.shape[1])))
        Ygt_d = jnp.asarray(Ygt)                     # device, once
        _mark("ygt_h2d", Ygt_d)
        from channel_pruning_tpu.utils.runtime import heartbeat as _hb
        _hb()  # per-layer watchdog progress mark (decompose stages)
        timer.tic()

        # ---- (a) spatial decomposition --------------------------------
        X = None
        if roll is not None:
            try:
                roll.advance_to(dev_run, l_run.bottoms[0])
                X = roll.patches_at(cache.plan, conv)
            except rolling_mod.FrontierError as exc:
                print(f"[rolling] fallback for {conv}: {exc}")
                frontier_fallbacks.append(conv)
        if X is None:
            X = sampling.sample_patches(g_run, dev_run, cache.device_inputs(), conv,
                                        cache.plan, chunk_batches=chunk,
                                        compute_dtype=cdt, mesh=mesh)
        if mesh is not None and mesh.devices.size > 1 and \
                isinstance(X, jax.Array):
            # replicate the decompose-stage inputs: the VH refit / ITQ ALS
            # are ITERATIVE solvers — run over a row-sharded X their psum
            # partial-sum order differs from the single-device reduction and
            # the drift amplifies across ALS sweeps (a borderline arm
            # selection flipped in the 8-device dryrun). Replication makes
            # them bit-identical to the solo pass; the big reductions — the
            # frontier advance and the arm's Gram/normal equations — stay
            # sample-sharded (the scaling axis, SURVEY §5)
            from jax.sharding import NamedSharding, PartitionSpec
            X = jax.device_put(X, NamedSharding(mesh, PartitionSpec()))
        _mark("patches", X)
        if not _epscheck_device(X, warn=1e5, reject=1e6):
            # extreme accumulated activations would fault the device
            # eigh/SVD kernels — keep the layer untouched
            print(f"[3c] {conv}: inputs rejected by epscheck — layer kept")
            undecomposed.append(conv)
            reports.append(LayerReport(conv=conv, rank=rank,
                                       seconds=timer.toc()))
            continue
        _mark("epscheck")
        try:
            vh = lowrank.vh_decompose(W_cur, rank, X=X, Y=Ygt_d,
                                      lambdas=cfg.solve.nonlinear_lambdas,
                                      iters=cfg.solve.nonlinear_iters,
                                      pad_to=(c_pad, n_pad, r_pad))
        except np.linalg.LinAlgError as exc:
            print(f"[3c] {conv}: spatial decomposition failed ({exc}) — "
                  "layer kept undecomposed")
            undecomposed.append(conv)
            reports.append(LayerReport(conv=conv, rank=rank,
                                       seconds=timer.toc()))
            continue
        if not _epscheck(vh.VHr, vh.b, vh.V, vh.H):
            print(f"[3c] {conv}: spatial factors rejected by epscheck — "
                  "layer kept undecomposed")
            undecomposed.append(conv)
            reports.append(LayerReport(conv=conv, rank=rank,
                                       seconds=timer.toc()))
            continue
        _mark("vh", vh.VHr, vh.H, vh.b)
        p_run[conv]["W"] = np.asarray(vh.VHr)
        p_run[conv]["b"] = np.asarray(vh.b)
        _sync(conv)
        t_spatial = timer.toc()

        # ---- (b) channel decomposition (ITQ) --------------------------
        timer.tic()
        # the post-VH responses at the sampled points are exactly the
        # already-extracted patches convolved with VHr — no replay needed
        # (the reference re-runs a 500-batch extraction here, net.py:1386),
        # and the padded refit program already produced them (vh.feat).
        # feat and the ground truth stay DEVICE-resident: the ITQ ALS runs
        # on device anyway, and only scalar telemetry crosses the link
        feat = vh.feat
        _mark("feat", feat)
        if _epscheck_device(feat, warn=1e5, reject=1e6):
            try:
                itq = lowrank.itq_decompose(feat, Ygt_d, vh.H_pad, rank,
                                            bias=vh.b_pad, Wr=vh.VHr_pad,
                                            lambdas=cfg.solve.itq_lambdas,
                                            iters=cfg.solve.itq_iters,
                                            true_shape=(n_out, c_full))
                itq_ok = _epscheck(itq.W1, itq.W2, itq.B, itq.W12)
            except np.linalg.LinAlgError as exc:
                print(f"[3c] {conv}: ITQ solve failed ({exc})")
                itq, itq_ok = None, False
        else:
            itq, itq_ok = None, False
        _mark("itq", None if itq is None else itq.W12)
        if itq_ok:
            p_run[conv]["W"] = np.asarray(itq.W12)
            p_run[conv]["b"] = np.asarray(itq.B)
            _sync(conv)
        else:
            print(f"[3c] {conv}: ITQ factors rejected by epscheck — "
                  "layer kept at spatial (VH) decomposition only")
            itq_degraded.append(conv)
        # per-layer decomposition telemetry: relative error of the ReLU'd
        # responses, VH-only vs final (VH+ITQ when it held) — the measured
        # "3C beats spatial-only" evidence (reference prints the analogous
        # Reconstruction Err inside ITQ, decompose.py:202)
        rmse_vh = float(_relu_rel_error(Ygt_d, feat))
        if itq_ok:
            # itq.feat2 == X ⊛ W12 + B, evaluated inside the fold program
            rmse_final = float(_relu_rel_error(Ygt_d, itq.feat2))
        else:
            rmse_final = rmse_vh
        _mark("telemetry")
        t_channel = timer.toc()

        # ---- output graph: conv -> V, insert H (and P when ITQ held) --
        keep_in = input_keep.get(conv, np.ones(c_full, bool))
        V = np.asarray(vh.V)[:, keep_in]             # (rank, c_kept, kh, 1)
        if itq_ok:
            Hw, Hb = np.asarray(itq.W1), None        # (rank, rank_v, 1, kw)
            Pw = np.asarray(itq.W2)                  # (n_out, rank, 1, 1)
            Pb = np.asarray(itq.B)
        else:
            Hw, Hb = np.asarray(vh.H), np.asarray(vh.b)
            Pw = Pb = None
        g_out, p_out = rewrite.set_conv(
            g_out, p_out, conv, W=V, b=None, bias=False,
            num_output=rank, kernel_h=kh, kernel_w=1,
            stride_h=geo["sh"], stride_w=1, pad_h=geo["ph"], pad_w=0,
            new_name=f"{conv}_V")
        p_out[f"{conv}_V"].pop("b", None)
        g_out, p_out = rewrite.insert_conv_after(
            g_out, p_out, f"{conv}_V", f"{conv}_H", Hw, Hb,
            stride=(1, geo["sw"]), pad=(0, geo["pw"]))
        if itq_ok:
            g_out, p_out = rewrite.insert_conv_after(
                g_out, p_out, f"{conv}_H", f"{conv}_P", Pw, Pb,
                stride=1, pad=(0, 0))
        reports.append(LayerReport(conv=conv, rank=rank,
                                   rmse_before=rmse_vh, rmse_after=rmse_final,
                                   seconds=t_spatial + t_channel))

        # ---- (c) prune the next conv's inputs -------------------------
        convnext = convs[i + 1] if i + 1 < len(convs) else None
        if convnext is not None and cfg.dic.vh:
            d_c = int(math.floor(n_out / cfg.dic.c_ratio))
            timer.tic()
            Xn = None
            if roll is not None:
                try:
                    roll.advance_to(dev_run, g_run.layer(convnext).bottoms[0])
                    Xn = roll.patches_at(cache.plan, convnext)
                except rolling_mod.FrontierError as exc:
                    print(f"[rolling] fallback for {convnext}: {exc}")
                    frontier_fallbacks.append(convnext)
            if Xn is None:
                Xn = sampling.sample_patches(g_run, dev_run, cache.device_inputs(),
                                             convnext, cache.plan,
                                             chunk_batches=chunk,
                                             compute_dtype=cdt, mesh=mesh)
            _mark("arm_patches", Xn)
            topn = g_run.layer(convnext).tops[0]
            bn2 = p_run[convnext].get(
                "b", np.zeros(p_run[convnext]["W"].shape[0], np.float32))
            # device-cached ground truth (see solve_prune): only the bias
            # subtraction runs per layer, no fresh ~100 MB h2d
            if topn not in feats_dev:
                feats_dev[topn] = sampling.chunked_device_put(
                    np.asarray(cache.feats[topn], np.float32))
            Yn = feats_dev[topn] - jnp.asarray(bn2, jnp.float32)
            res = prune_mod.select_and_reconstruct(
                Xn, np.asarray(p_run[convnext]["W"], np.float32), Yn, d_c,
                rank_tol=cfg.dic.rank_tol, alpha0=cfg.solve.alpha,
                subsample=cfg.lasso.subsample_rows,
                n_sweeps=cfg.lasso.n_sweeps, grid_size=cfg.lasso.grid_size,
                max_rounds=cfg.lasso.max_rounds, ridge=cfg.solve.ls_ridge,
                seed=cfg.sample.seed, mesh=mesh, group=cfg.dic.grplasso,
                prefer=cfg.solve.band, fused=cfg.solve.fused_search,
                autodet=cfg.solve.autodet, layeralpha=cfg.dic.layeralpha,
                pad_to=tuple(pad_buckets[(
                    g_run.layer(convnext).conv_geometry()["kh"],
                    g_run.layer(convnext).conv_geometry()["kw"])]))
            t_prune = timer.toc()
            _mark("arm_solve")
            p_run[convnext]["W"] = _scatter_inputs(res.W, res.keep)
            p_run[convnext]["b"] = res.b
            _sync(convnext)
            input_keep[convnext] = res.keep
            selections[convnext] = res.keep
            # output graph: slice the producer's rows (P, or H when the ITQ
            # stage was rejected), install consumer W
            prod_key = f"{conv}_P" if itq_ok else f"{conv}_H"
            p_out[prod_key] = dict(p_out[prod_key])
            p_out[prod_key]["W"] = np.asarray(p_out[prod_key]["W"])[res.keep]
            if "b" in p_out[prod_key]:
                p_out[prod_key]["b"] = np.asarray(p_out[prod_key]["b"])[res.keep]
            g_out, p_out = rewrite.set_conv(g_out, p_out, prod_key,
                                            num_output=int(res.keep.sum()))
            g_out, p_out = rewrite.prune_conv_inputs(
                g_out, p_out, convnext, res.keep, W=res.W, b=res.b)
            reports.append(LayerReport(
                conv=convnext, kept=int(res.keep.sum()), total=int(n_out),
                alpha=res.alpha, rmse_before=res.rmse_before,
                rmse_after=res.rmse_after, seconds=t_prune))
            if verbose:
                print(f"[3c] {conv}: rank {rank}; prune {convnext} "
                      f"{int(res.keep.sum())}/{n_out} rMSE "
                      f"{res.rmse_before:.4f}->{res.rmse_after:.4f}")
        elif verbose:
            print(f"[3c] {conv}: rank {rank}")
        if checkpoint is not None:
            checkpoint.maybe_save(i, {"p_run": p_run, "g_out": g_out,
                                      "p_out": p_out,
                                      "selections": selections,
                                      "input_keep": input_keep,
                                      "reports": reports,
                                      "frontier_fallbacks": frontier_fallbacks,
                                      "itq_degraded": itq_degraded,
                                      "undecomposed": undecomposed})
        _mark("ckpt")
        _phase_report(conv)

    if checkpoint is not None:
        checkpoint.clear()
    g_out.validate()
    n_3c = sum(1 for c in convs if c not in skip and c in ranks)
    n_deg = len(itq_degraded) + len(undecomposed)
    print(f"[3c] {n_3c - n_deg}/{n_3c} layers fully decomposed "
          f"(VH+ITQ); {len(itq_degraded)} VH-only, "
          f"{len(undecomposed)} untouched")
    return SolveResult(graph=g_out, params=p_out, reports=reports,
                       selections=selections,
                       frontier_fallbacks=frontier_fallbacks,
                       itq_degraded=itq_degraded, undecomposed=undecomposed)
