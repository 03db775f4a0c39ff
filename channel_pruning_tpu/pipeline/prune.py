"""Per-layer channel pruning kernels.

The reference's `dictionary_kernel` (lib/net.py:1685-1735) + `dictionary`
solver (lib/decompose.py:386-634) + selection application W1keep/W2keep
(lib/net.py:1521-1625), restated TPU-first:

  1. gather the consumer's input patches X (N, c, kh, kw) from the *current*
     (already-compressed) net — asymmetric reconstruction, the ground truth Y
     comes from the frozen cache of the original net;
  2. LASSO channel selection on a row subsample via the on-device Gram CD
     solver (ops/lasso.py);
  3. least-squares reconstruction of the surviving weights on the FULL sample
     set via the on-device Cholesky solver (ops/lstsq.py);
  4. application = pure graph rewrites (graph/rewrite.py) instead of zeroing
     channels in place.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax.numpy as jnp
import numpy as np

import functools

import jax

from channel_pruning_tpu.graph.ir import Graph, LT
from channel_pruning_tpu.graph import rewrite
from channel_pruning_tpu.ops import lasso, lstsq
from channel_pruning_tpu.ops.lstsq import f32_matmuls


@functools.partial(jax.jit)
@f32_matmuls
def _device_rel_error(Xd, W, b, Yd):
    """rel_error(Y, X (*) W + b) computed on device — the (N, n) prediction
    never leaves HBM, only the scalar does (reference telemetry,
    lib/net.py:1726)."""
    pred = jnp.einsum("nchw,ochw->no", Xd, W) + b
    num = jnp.mean((Yd - pred) ** 2)
    den = jnp.mean(Yd ** 2)
    return jnp.sqrt(num) / jnp.sqrt(den + 1e-30)

@functools.partial(jax.jit, static_argnames=(
    "rank_tol", "alpha0", "grid_size", "max_rounds", "n_sweeps",
    "prefer", "ridge"))
@f32_matmuls
def _fused_layer_solve(Xd, W2d, Yd, rows, rank, rank_tol, alpha0,
                       grid_size, max_rounds, n_sweeps, prefer, ridge):
    """The ENTIRE per-layer solve as one device program: rMSE-before,
    Z-build on the row subsample, Gram, the fused alpha search
    (ops/lasso._fused_search, itself a lax.while_loop), masked full-width
    least-squares reconstruction on all N rows, and rMSE-after. One
    dispatch, one host fetch — the host-stepped path costs ~15-25.
    `rank` is a device scalar so every same-shaped layer reuses ONE
    compiled program (the keep target is the only per-layer variation).

    The reconstruction masks excluded channels' columns to zero instead of
    gathering survivors: zeroed columns produce exactly-zero rows in the
    normal equations and exactly-zero coefficients under the jitter ridge
    (the same contract the bucketed gather path relies on for its padding),
    and the trace-scaled jitter sees only surviving channels' energy either
    way — so the lstsq.fit_linear W matches the gather path up to fp
    reduction order."""
    N, c, kh, kw = Xd.shape
    n = W2d.shape[0]
    rmse_before = _device_rel_error(Xd, W2d, jnp.zeros((), jnp.float32), Yd)
    Xs, Ys = Xd[rows], Yd[rows]
    Z = lasso.build_channel_response(Xs, W2d)
    G = Z.T @ Z
    G = 0.5 * (G + G.T)
    bg = Z.T @ Ys.reshape(-1)
    mask, alpha, support = lasso._fused_search(
        G, bg, jnp.float32(Z.shape[0]), rank, rank_tol, alpha0,
        grid_size, max_rounds, n_sweeps, prefer)
    colmask = jnp.repeat(mask, kh * kw).astype(Xd.dtype)
    Xm = Xd.reshape(N, c * kh * kw) * colmask
    W, b = lstsq.fit_linear(Xm, Yd, ridge=ridge)   # (n, c*kh*kw), 0 off-mask
    Wfull = W.reshape(n, c, kh, kw)
    rmse_after = _device_rel_error(Xd, Wfull, b, Yd)
    return mask, alpha, support, Wfull, b, rmse_before, rmse_after


_CHANNEL_PRESERVING = (LT.RELU, LT.POOL, LT.DROPOUT, LT.BN, LT.SCALE)


def producer_conv(graph: Graph, tensor: str, before: str | None = None) -> str | None:
    """Walk back through channel-preserving layers to the conv producing the
    channel dimension of `tensor` (the reference resolves this through its
    type caches + bottom maps, lib/net.py:107-120)."""
    seen = set()
    cur = tensor
    while cur not in seen:
        seen.add(cur)
        prod = (graph.producer_before(cur, before) if before is not None
                else graph.producer(cur))
        if prod is None:
            return None
        if prod.type == LT.CONV:
            return prod.name
        if prod.type in _CHANNEL_PRESERVING:
            cur = prod.bottoms[0]
            continue
        return None
    return None


@dataclass
class PruneResult:
    keep: np.ndarray          # bool (c,) surviving input channels
    W: np.ndarray             # (n, keep, kh, kw) reconstructed consumer weights
    b: np.ndarray             # (n,)
    alpha: float              # LASSO alpha that hit the support band
    rmse_before: float        # rel rMSE of X*W2 vs Y before pruning (net.py:1726)
    rmse_after: float         # after selection + reconstruction


@lstsq.f32_matmuls
def select_and_reconstruct(X: np.ndarray, W2: np.ndarray, Y: np.ndarray,
                           rank: int, *, rank_tol: float = 0.1,
                           alpha0: float = 1e-3, subsample: int = 400,
                           n_sweeps: int = 200, grid_size: int = 16,
                           max_rounds: int = 8, ridge: float = 0.0,
                           seed: int = 0, group: bool = False,
                           alter_iters: int = 0, mesh=None,
                           prefer: str = "top",
                           fused: bool = False,
                           pad_to: tuple[int, int] | None = None,
                           autodet: bool = False,
                           layeralpha: float = 1.0) -> PruneResult:
    """One layer's LASSO selection + lstsq reconstruction.

    X: (N, c, kh, kw) consumer input patches (current net),
    W2: (n, c, kh, kw) consumer weights, Y: (N, n) ground-truth responses
    (bias already subtracted — net.py:1707).

    `group=True` selects with the row-sparse group lasso instead of the
    summed-response single-task form (the reference's MultiTaskLasso branch
    for 1x1/FC consumers, decompose.py:439-444). `alter_iters` runs the
    alternating LASSO <-> least-squares refinement (decompose.py:526-580).
    `autodet=True` is the reference's fixed-alpha support-free mode
    (c.autodet, lib/cfgs.py:110): the LASSO is solved ONCE at
    alpha0 / c**layeralpha (decompose.py:414-415) and `rank` is ignored —
    the support size is whatever falls out (decompose.py:582-585).
    """
    N, c = X.shape[0], X.shape[1]
    rank = int(min(max(rank, 1), c))
    if autodet:
        fused = False       # the fused program searches a band; autodet is
        alter_iters = 0     # one fixed-alpha solve, no refinement

    from channel_pruning_tpu.utils.runtime import chunked_device_put
    Xd = chunked_device_put(np.asarray(X, np.float32)) \
        if not isinstance(X, jax.Array) else jnp.asarray(X, jnp.float32)
    Yd = chunked_device_put(np.asarray(Y, np.float32)) \
        if not isinstance(Y, jax.Array) else jnp.asarray(Y, jnp.float32)

    # group-lasso selection only ever applies to 1x1/FC consumers (the
    # branch below is gated on kh*kw==1, mirroring decompose.py:439-444),
    # so `group` on a k>1 conv must not knock out the fused fast path
    group_active = group and X.shape[2] * X.shape[3] == 1
    if fused and not group_active and not alter_iters and rank < c:
        # whole-layer fused fast path: ONE device program for
        # rMSE/Z/Gram/search/reconstruction (see _fused_layer_solve).
        # With a mesh the inputs are row-sharded so GSPMD partitions the
        # program's big reductions over ICI — the same SPMD plan as the
        # pipelined pass, selections identical either way (a mesh must NOT
        # change the search path: the host-stepped sharded solver walks a
        # different alpha trajectory and can land elsewhere in the band)
        from channel_pruning_tpu.utils.runtime import heartbeat as _hb
        _hb()
        n_sub = min(subsample, max(N // 20, 1))
        rows = np.random.default_rng(seed).integers(0, N, size=n_sub)
        Xp, Yp = Xd, Yd
        W2p = jnp.asarray(W2, jnp.float32)
        n_out = W2p.shape[0]
        if pad_to is not None:
            # zero-pad to a shared (c_pad, n_pad) bucket so same-kernel
            # layers reuse ONE compiled fused-solve program (padding is
            # selection-inert — see c3._pipelined_conv_pass docstring).
            # Padded locals only: the degenerate fall-through below resumes
            # on the unpadded Xd/Yd
            c_pad, n_pad = max(pad_to[0], c), max(pad_to[1], n_out)
            if c < c_pad:
                Xp = jnp.pad(Xp, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
                W2p = jnp.pad(W2p, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
            if n_out < n_pad:
                W2p = jnp.pad(W2p, ((0, n_pad - n_out), (0, 0), (0, 0), (0, 0)))
                Yp = jnp.pad(Yp, ((0, 0), (0, n_pad - n_out)))
        if mesh is not None and mesh.devices.size > 1 \
                and N % mesh.devices.size == 0:
            from channel_pruning_tpu.parallel import mesh as mesh_mod
            row_sharded = mesh_mod.batch_sharded(mesh)
            Xp = jax.device_put(Xp, row_sharded)
            Yp = jax.device_put(Yp, row_sharded)
        out = _fused_layer_solve(
            Xp, W2p, Yp, jnp.asarray(rows),
            jnp.int32(rank), float(rank_tol), float(alpha0), grid_size,
            max_rounds, n_sweeps, prefer, float(ridge))
        keep = np.asarray(out[0])[:c]
        if keep.sum() > 0:
            return PruneResult(
                keep=keep, W=np.asarray(out[3])[:n_out, :c][:, keep],
                b=np.asarray(out[4])[:n_out], alpha=float(out[1]),
                rmse_before=float(out[5]), rmse_after=float(out[6]))
        # degenerate (empty selection): fall through to the generic path's
        # magnitude fallback below
    # rMSE on device — only the scalar crosses the link (pred/Y are ~100 MB
    # each at VGG scale; fetching them per layer would cost seconds on the
    # tunnel just to print telemetry)
    rmse_before = float(_device_rel_error(Xd, jnp.asarray(W2, jnp.float32),
                                          jnp.zeros((), jnp.float32), Yd))
    from channel_pruning_tpu.utils.runtime import heartbeat
    heartbeat()  # per-layer watchdog progress mark

    if rank >= c and not autodet:
        keep = np.ones(c, bool)
        alpha = 0.0
    else:
        if autodet:
            # fixed alpha, support free (decompose.py:414-415,582-585);
            # `rank` only seeds the degenerate magnitude fallback below
            keep, alpha, _ = lasso.select_channels_fixed(
                X, W2, Y, alpha0 / c ** layeralpha, subsample=subsample,
                seed=seed, n_sweeps=n_sweeps, mesh=mesh)
        elif group_active:
            # row-sparse group lasso directly on the (N, c) design — only
            # meaningful for 1x1/FC consumers (the reference's MultiTaskLasso
            # branch is likewise gated on afterconv/FC, decompose.py:439-444)
            keep, alpha, _ = lasso.select_channels_group(
                X.reshape(N, -1), Y, rank, alpha0=alpha0,
                rank_tol=rank_tol, subsample=subsample, seed=seed,
                grid_size=grid_size, max_rounds=max_rounds, n_sweeps=n_sweeps,
                mesh=mesh, prefer=prefer)
        else:
            keep, alpha, _ = lasso.select_channels(
                X, W2, Y, rank, alpha0=alpha0, rank_tol=rank_tol,
                subsample=subsample, seed=seed, grid_size=grid_size,
                max_rounds=max_rounds, n_sweeps=n_sweeps, mesh=mesh,
                prefer=prefer, fused=fused)
        if keep.sum() == 0:
            # degenerate layer (LASSO kills everything at every probed
            # alpha): fall back to magnitude selection so the graph stays
            # well-formed (reference pruning_kernel, net.py:1632-1639)
            keep = magnitude_select(W2, rank)
            alpha = float("nan")
        if alter_iters and np.isfinite(alpha):
            refined = _alternate_refine(X, W2, Y, keep, rank, rank_tol,
                                        alpha, alter_iters,
                                        subsample=subsample, seed=seed,
                                        n_sweeps=n_sweeps)
            if refined is not None and refined.sum() > 0:
                keep = refined

    # least-squares reconstruction on surviving channels, FULL sample set
    # (decompose.py:622-623 -> fc_kernel). The design matrix is zero-padded
    # to a channel-count bucket so the jitted Cholesky solve compiles once
    # per layer-size class instead of once per (data-dependent) support size;
    # padded columns get exactly-zero coefficients from the jitter ridge.
    kh, kw = X.shape[2], X.shape[3]
    n_keep = int(keep.sum())
    bucket = -(-n_keep // 32) * 32
    keep_idx = np.where(keep)[0]
    idx_pad = np.concatenate([keep_idx, np.zeros(bucket - n_keep, np.int64)])
    Xk = jnp.take(Xd, jnp.asarray(idx_pad), axis=1).reshape(N, -1)
    mask = jnp.asarray((np.arange(bucket) < n_keep)
                       .repeat(kh * kw).astype(np.float32))
    Xk = Xk * mask                       # zero the padded columns
    if mesh is not None and mesh.devices.size > 1:
        # FULL-N reconstruction is the big reduction (N x bucket*kh*kw):
        # shard sample rows, psum the normal equations (SURVEY.md §5 —
        # the sample dimension is this framework's sequence parallelism)
        from channel_pruning_tpu.parallel.sharded import sharded_lstsq
        W, b = sharded_lstsq(Xk, Yd, mesh, ridge=ridge)
    else:
        W, b = lstsq.fit_linear(Xk, Yd, ridge=ridge)
    W = np.asarray(W).reshape(Y.shape[1], bucket, kh, kw)[:, :n_keep]
    b = np.asarray(b)

    # rMSE at the FULL input width (stable shape -> shared compile with pred0)
    Wfull = np.zeros((Y.shape[1], c, kh, kw), np.float32)
    Wfull[:, keep] = W
    rmse_after = float(_device_rel_error(Xd, jnp.asarray(Wfull),
                                         jnp.asarray(b), Yd))
    return PruneResult(keep=np.asarray(keep, bool), W=W, b=b, alpha=float(alpha),
                       rmse_before=rmse_before, rmse_after=rmse_after)


def magnitude_select(W2: np.ndarray, rank: int) -> np.ndarray:
    """Baseline: keep the `rank` input channels with largest sum|W|
    (reference pruning_kernel, lib/net.py:1632-1639)."""
    saliency = np.abs(W2).sum(axis=(0, 2, 3))
    keep = np.zeros(W2.shape[1], bool)
    keep[np.argsort(-saliency)[:rank]] = True
    return keep


def apply_pruning(graph: Graph, params: Mapping[str, Mapping[str, np.ndarray]],
                  consumer: str, result: PruneResult,
                  shrink_producer: bool = True) -> tuple[Graph, dict]:
    """Install a PruneResult: consumer gets reconstructed (W, b); the producer
    conv's output channels are physically removed when safe (single-consumer
    chain — W1keep, net.py:1521-1608); otherwise a Select (Filter) layer is
    inserted in front of the consumer (net.py:1627-1630)."""
    g, params = rewrite.prune_conv_inputs(graph, params, consumer,
                                          result.keep, W=result.W, b=result.b)
    bottom = g.layer(consumer).bottoms[0]
    prod = producer_conv(g, bottom, before=consumer)
    safe = depthwise = False
    if shrink_producer and prod is not None and \
            _sole_consumer_chain(g, prod, consumer):
        group = g.layer(prod).conv_geometry()["group"]
        # a grouped conv's output count is tied to its group structure, so
        # only group==1 producers shrink freely — EXCEPT depthwise convs
        # (group == channels), whose channels are independent: the keep mask
        # passes through 1:1 and the shrink continues upstream (the Xception
        # dw->pw chain; reference family list lib/cfgs.py:56-60)
        safe = group == 1
        depthwise = group > 1 and group == int(g.layer(prod).attr("num_output"))
    if safe:
        g, params = rewrite.prune_conv_outputs(g, params, prod, result.keep)
    elif depthwise:
        g, params = _shrink_depthwise_chain(g, params, prod, result.keep)
    else:
        g = rewrite.insert_select(g, bottom, consumer, result.keep)
    return g, params


def _shrink_depthwise_chain(graph: Graph,
                            params: Mapping[str, Mapping[str, np.ndarray]],
                            dw: str, keep: np.ndarray) -> tuple[Graph, dict]:
    """Physically shrink a depthwise conv to the kept channels (W rows, BN/
    Scale, num_output AND group), then propagate the same mask to ITS
    producer: shrink a safe group==1 upstream conv's outputs, recurse
    through stacked depthwise convs, or gate with a Select as a last
    resort. This is what lifts Xception beyond gate-only pruning — the
    dw 3x3 and the upstream pw 1x1 both lose the pruned channels."""
    g, params = rewrite.prune_conv_outputs(graph, params, dw, keep)
    g, params = rewrite.set_conv(g, params, dw, group=int(keep.sum()))
    bottom = g.layer(dw).bottoms[0]
    up = producer_conv(g, bottom, before=dw)
    if up is not None and _sole_consumer_chain(g, up, dw):
        geo = g.layer(up).conv_geometry()
        if geo["group"] == 1:
            return rewrite.prune_conv_outputs(g, params, up, keep)
        if geo["group"] == int(g.layer(up).attr("num_output")):
            return _shrink_depthwise_chain(g, params, up, keep)
    g = rewrite.insert_select(g, bottom, dw, keep)
    return g, params


def _sole_consumer_chain(graph: Graph, prod: str, consumer: str) -> bool:
    """True if prod's output reaches only `consumer` through channel-
    preserving layers (so physically shrinking its outputs is safe)."""
    frontier = [graph.layer(prod).tops[0]]
    visited = set()
    while frontier:
        t = frontier.pop()
        if t in visited:
            continue
        visited.add(t)
        for cons in graph.consumers(t):
            if cons.name == consumer:
                continue
            if cons.type in _CHANNEL_PRESERVING:
                frontier.extend(cons.tops)
            else:
                return False
    return True


def _alternate_refine(X, W2, Y, keep, rank, rank_tol, alpha0, iters, *,
                      subsample=400, seed=0, n_sweeps=200):
    """Alternating LASSO <-> least-squares refinement of the selection
    (reference dic.alter loop + updateW2, decompose.py:468-485,526-580):
    refit the consumer on the current support, rebuild the per-channel
    responses with the refit weights, and re-select with the SAME
    support-size target (the reference re-enters its bisection with the
    updated Z each pass). Returns the refined mask (or None)."""
    import jax.numpy as jnp

    from channel_pruning_tpu.ops import lstsq

    N, c = X.shape[0], X.shape[1]
    kh, kw = X.shape[2], X.shape[3]
    n = W2.shape[0]
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, N, size=min(subsample, max(N // 20, 1)))
    Xs = jnp.asarray(X[rows], jnp.float32)
    Ys = jnp.asarray(Y[rows], jnp.float32)
    cur = np.asarray(keep, bool)
    for _ in range(iters):
        if cur.sum() == 0:
            return None
        Wk, _ = lstsq.fit_linear(Xs[:, cur].reshape(len(rows), -1), Ys)
        W2p = np.zeros_like(W2)
        W2p[:, cur] = np.asarray(Wk).reshape(n, int(cur.sum()), kh, kw)
        Z = lasso.build_channel_response(Xs, jnp.asarray(W2p))
        gram = lasso.lasso_gram(Z, Ys.reshape(-1))
        new, alpha0, _ = lasso.search_alpha(gram, rank, rank_tol,
                                            alpha0=max(alpha0, 1e-6),
                                            n_sweeps=n_sweeps)
        if new.sum() == 0:
            return cur
        cur = np.asarray(new, bool)
    return cur
