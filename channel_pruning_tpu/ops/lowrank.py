"""Low-rank decompositions on device: spatial (VH) SVD and ReLU-aware
channel decomposition (ITQ), plus the nonlinear (ReLU-ALS) least-squares fit.

Capability parity with lib/decompose.py:85-147 (VH_decompose), 163-319
(ITQ_decompose), 671-685 (nonlinear_fc), redesigned for TPU:

* the per-iteration rank-k SVD truncation of the (N x d) matrix in ITQ is
  replaced by an eigendecomposition of the (d x d) projected Gram — exact
  same truncation (right singular vectors), but the O(N) work per iteration
  collapses to two MXU matmuls (see `itq_decompose`), and
* the ALS least-squares refits reuse one Cholesky factorisation of the fixed
  design matrix instead of refitting from scratch each iteration.

SVD factors are sign/rotation ambiguous vs scipy gesvd, so parity is
validated on reconstruction error, not factor equality (SURVEY.md §7).
"""
from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.ops import lstsq
from channel_pruning_tpu.ops.lstsq import f32_matmuls

# see pipeline/c3._PHASE_TIMING: fenced sub-phase prints for attribution runs
_PHASE_TIMING = os.environ.get("CP_TPU_PHASE_TIMING", "") == "1"


def _tprint(tag: str, t0: float, *vals) -> float:
    """When phase timing is on: fence `vals`, print `tag` with the elapsed
    time since t0, and return a fresh t0. No-op (no fences) otherwise."""
    if not _PHASE_TIMING:
        return t0
    for v in vals:
        if v is not None:
            jax.block_until_ready(v)
    now = time.perf_counter()
    print(f"[phase]   {tag}={now - t0:.2f}s", flush=True)
    return now


# ---------------------------------------------------------------------------
# nonlinear (ReLU-aware) linear fit
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("lambdas", "iters"))
@f32_matmuls
def nonlinear_fit(X: jax.Array, Y: jax.Array,
                  lambdas: tuple[float, ...] = (0.1, 1.0),
                  iters: tuple[int, ...] = (30, 20),
                  ) -> tuple[jax.Array, jax.Array]:
    """Fit relu(X W.T + b) ≈ relu(Y) by alternating least squares with the
    closed-form ReLU relaxation (decompose.py:671-685 schedule)."""
    f = lstsq.factor(X)
    Z = jnp.maximum(Y, 0.0)

    def step(U, lam):
        W, b = lstsq.solve(f, X, U)
        RU = X @ W.T + b
        return lstsq.solve_relu(RU, Z, lam)

    U = Y
    for lam, n_it in zip(lambdas, iters):
        U = jax.lax.fori_loop(0, n_it, lambda _, u: step(u, lam), U)
    return lstsq.solve(f, X, U)


# ---------------------------------------------------------------------------
# spatial decomposition (VH)
# ---------------------------------------------------------------------------

class VHResult(NamedTuple):
    V: jax.Array      # (rank, c, kh, 1) vertical conv
    H: jax.Array      # (n, rank, 1, kw) horizontal conv
    VHr: jax.Array    # (n, c, kh, kw) rank-limited reconstruction of W
    b: jax.Array | None  # refit bias when data given
    # bucket-padded device-resident views (pad_to runs only): these let the
    # 3C driver chain straight into the padded ITQ/telemetry programs with
    # no per-layer-shape device ops (see _vh_refit_fused)
    feat: jax.Array | None = None      # (N, n_pad) responses X ⊛ VHr + b
    H_pad: jax.Array | None = None     # (n_pad, r_pad, 1, kw)
    VHr_pad: jax.Array | None = None   # (n_pad, c_pad, kh, kw)
    b_pad: jax.Array | None = None     # (n_pad,)


@functools.partial(jax.jit, static_argnames=("lambdas", "iters"))
@f32_matmuls
def _vh_refit_fused(Xp: jax.Array, Vp: jax.Array, Yp: jax.Array,
                    lambdas: tuple[float, ...], iters: tuple[int, ...]):
    """The whole data-driven VH refit as ONE bucket-shaped program.

    Every 3C layer is zero-padded to a shared (N, c_pad, kh, kw) /
    (r_pad, c_pad, kh) / (N, n_pad) bucket, so the entire model compiles
    this program ONCE — the eager per-layer-shape einsum/reshape chain it
    replaces cost ~10 s of program build PER LAYER through the axon stack
    (round-4 phase attribution: vh.project dominated the 3C wall while the
    ALS math itself was <0.5 s/layer). Zero-pad correctness: padded V rows
    give zero Xflat columns, which take exactly-zero coefficients under
    lstsq.factor's trace-scaled jitter (trace is unchanged by zero
    columns); padded Y columns give zero W rows and stay zero through
    solve_relu (0 target, 0 prediction).

    Returns (Wh, b, feat, H4, VHr) — all padded, device-resident; feat is
    the post-VH response Xflat @ Whᵀ + b ≡ X ⊛ VHr + b, which the 3C
    driver feeds straight to ITQ (the reference re-extracts 500 batches
    here, net.py:1386).
    """
    N = Xp.shape[0]
    r_pad, _, kh = Vp.shape
    kw = Xp.shape[3]
    Xv = jnp.einsum("nchp,rch->npr", Xp, Vp)
    Xflat = jnp.transpose(Xv, (0, 2, 1)).reshape(N, r_pad * kw)
    f = lstsq.factor(Xflat)
    Z = jnp.maximum(Yp, 0.0)

    def step(U, lam):
        W, b = lstsq.solve(f, Xflat, U)
        RU = Xflat @ W.T + b
        return lstsq.solve_relu(RU, Z, lam)

    U = Yp
    for lam, n_it in zip(lambdas, iters):
        U = jax.lax.fori_loop(0, n_it, lambda _, u: step(u, lam), U)
    Wh, b = lstsq.solve(f, Xflat, U)
    feat = Xflat @ Wh.T + b
    H4 = Wh.reshape(Yp.shape[1], r_pad, 1, kw)
    VHr = jnp.einsum("rch,nrw->nchw", Vp, H4[:, :, 0, :])
    return Wh, b, feat, H4, VHr


@f32_matmuls
def vh_decompose(W: jax.Array, rank: int, X: jax.Array | None = None,
                 Y: jax.Array | None = None,
                 lambdas: tuple[float, ...] = (0.1, 1.0),
                 iters: tuple[int, ...] = (30, 20),
                 pad_to: tuple[int, int, int] | None = None) -> VHResult:
    """Split a (n, c, kh, kw) conv into vertical (rank, c, kh, 1) and
    horizontal (n, rank, 1, kw) convs via SVD of the (c*kh, n*kw) unfolding;
    with calibration data (X patches (N, c, kh, kw), Y responses (N, n)) the
    horizontal factor + bias are refit with the ReLU-aware ALS
    (decompose.py:85-147).

    `pad_to=(c_pad, n_pad, r_pad)` routes the data refit through the
    bucket-shaped `_vh_refit_fused` program shared by every layer of the
    model (Y may arrive pre-padded to (N, n_pad)); results are sliced back
    to true shapes on host, and the padded device views are returned in the
    extra VHResult fields for the 3C driver to chain from."""
    n, c, kh, kw = W.shape
    _t0 = time.perf_counter()
    M = np.asarray(W, np.float64).transpose(1, 2, 0, 3).reshape(c * kh, n * kw)
    # SVD on host in f64 (the reference pins scipy gesvd, decompose.py:155;
    # device SVD kernels also fault on some shapes through the axon stack)
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    _t0 = _tprint("vh.svd_host", _t0)

    if X is not None and pad_to is not None:
        c_pad, n_pad, r_pad = (max(pad_to[0], c), max(pad_to[1], n),
                               max(pad_to[2], rank))
        Uk_np = U[:, :rank].astype(np.float32)          # (c*kh, rank)
        V_np = np.transpose(Uk_np.reshape(c, 1, kh, rank), (3, 0, 2, 1))
        Vp_np = np.zeros((r_pad, c_pad, kh), np.float32)
        Vp_np[:rank, :c, :] = V_np[..., 0]
        Xp = jnp.asarray(X, jnp.float32)
        if c < c_pad:
            Xp = jnp.pad(Xp, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
        Yp = jnp.asarray(Y, jnp.float32)
        if Yp.shape[1] < n_pad:
            Yp = jnp.pad(Yp, ((0, 0), (0, n_pad - Yp.shape[1])))
        assert Yp.shape[1] == n_pad, (Yp.shape, n_pad)
        _t0 = _tprint("vh.pad", _t0, Xp, Yp)
        Wh, b_pad, feat, H4, VHr_p = _vh_refit_fused(
            Xp, jnp.asarray(Vp_np), Yp, tuple(lambdas), tuple(iters))
        _t0 = _tprint("vh.relu_als", _t0, Wh, feat)
        Wh_np = np.asarray(Wh)                          # (n_pad, r_pad*kw)
        H = Wh_np.reshape(n_pad, r_pad, 1, kw)[:n, :rank]
        VHr = np.asarray(VHr_p)[:n, :c]
        b = np.asarray(b_pad)[:n]
        _t0 = _tprint("vh.fetch", _t0)
        return VHResult(V=jnp.asarray(V_np), H=H, VHr=VHr, b=b,
                        feat=feat, H_pad=H4, VHr_pad=VHr_p, b_pad=b_pad)

    U = jnp.asarray(U, jnp.float32)
    s = jnp.asarray(s, jnp.float32)
    Vt = jnp.asarray(Vt, jnp.float32)
    Uk = U[:, :rank]                       # (c*kh, rank)
    Hk = s[:rank, None] * Vt[:rank]        # (rank, n*kw)

    V = jnp.transpose(Uk.reshape(c, 1, kh, rank), (3, 0, 2, 1))  # (rank,c,kh,1)

    if X is not None:
        # data-driven refit of H: project patches through V, fit to Y
        # Xv[n, p, r] = sum_{c,kh} X[n,c,kh,p] * V[r,c,kh,0]
        Xv = jnp.einsum("nchp,rch->npr", X.astype(jnp.float32),
                        V[..., 0].astype(jnp.float32))
        # layout (rank, kw) row-major per sample, matching H's (r, 1, kw) axes
        Xflat = jnp.transpose(Xv, (0, 2, 1)).reshape(X.shape[0], rank * kw)
        # bucket-pad the ALS design columns to a rank multiple of 64 so the
        # jitted nonlinear_fit compiles once per bucket instead of once per
        # distinct layer rank (appended zero columns take exactly-zero
        # coefficients under lstsq.factor's jitter ridge — the same contract
        # fit_linear's bucketed reconstruction relies on)
        rank_pad = -(-rank // 64) * 64
        if rank_pad > rank:
            Xflat = jnp.concatenate(
                [Xflat, jnp.zeros((X.shape[0], (rank_pad - rank) * kw),
                                  Xflat.dtype)], axis=1)
        _t0 = _tprint("vh.project", _t0, Xflat)
        Wh, b = nonlinear_fit(Xflat, Y.astype(jnp.float32), lambdas, iters)
        _t0 = _tprint("vh.relu_als", _t0, Wh, b)
        H = Wh.reshape(n, rank_pad, 1, kw)[:, :rank]
        Hk = jnp.transpose(H[:, :, 0, :], (1, 0, 2)).reshape(rank, n * kw)
    else:
        H = jnp.transpose(Hk.reshape(rank, n, kw, 1), (1, 0, 3, 2))
        b = None

    VHr = (Uk @ Hk).reshape(c, kh, n, kw)
    VHr = jnp.transpose(VHr, (2, 0, 1, 3))
    return VHResult(V=V, H=H, VHr=VHr, b=b)


# ---------------------------------------------------------------------------
# ReLU-aware channel decomposition (ITQ)
# ---------------------------------------------------------------------------

class ITQResult(NamedTuple):
    W1: jax.Array    # folded producer weights: (rank,) + H_weight.shape[1:]
    W2: jax.Array    # new 1x1 conv: (d, rank, 1, 1)
    B: jax.Array     # bias (d,)
    W12: jax.Array   # merged low-rank producer (for asymmetric overwrite)
    # pad_to runs only: padded device responses of the factored layer at the
    # calibration points, (feat - b) @ (L R) + B — telemetry without a
    # per-layer-shape einsum program (see _itq_fold_fused)
    feat2: jax.Array | None = None


@jax.jit
@f32_matmuls
def _itq_fold_fused(weight_p: jax.Array, Wr_p: jax.Array, L_p: jax.Array,
                    R_p: jax.Array, T: jax.Array, Y_mean: jax.Array,
                    U_mean: jax.Array, bias_p: jax.Array, feat: jax.Array):
    """Factor folding + bias + telemetry as ONE bucket-shaped program
    (same per-layer-program-cost rationale as `_vh_refit_fused`): folds the
    left factor into the H conv and the merged VHr, forms the 1x1 conv and
    bias, and evaluates the factored responses at the calibration points.
    Zero pad rows/columns of every input stay zero through the matmuls."""
    d = weight_p.shape[0]
    Wt_w = jnp.transpose(weight_p, (1, 2, 3, 0)).reshape(-1, d)
    W1 = jnp.transpose(
        (Wt_w @ L_p).reshape(weight_p.shape[1:] + (L_p.shape[1],)),
        (3, 0, 1, 2))
    LR = L_p @ R_p
    Wt_r = jnp.transpose(Wr_p, (1, 2, 3, 0)).reshape(-1, d)
    W12 = jnp.transpose(
        (Wt_r @ LR).reshape(Wr_p.shape[1:] + (d,)), (3, 0, 1, 2))
    W2 = jnp.transpose(R_p).reshape(d, R_p.shape[0], 1, 1)
    B = -Y_mean @ T + U_mean + bias_p @ T
    feat2 = (feat - bias_p) @ LR + B
    return W1, W2, B, W12, feat2


def _host_eigh(A) -> tuple[np.ndarray, np.ndarray]:
    """eigh on host in f64: the (d x d) eigendecompositions in the ITQ loop
    are tiny (ms on host) but TPU eigh kernels fault on some shapes through
    the axon stack (which also lacks callback support), and the reference
    ran these in f64 numpy anyway (lib/decompose.py)."""
    w, v = np.linalg.eigh(np.asarray(A, np.float64))
    f32max = np.finfo(np.float32).max
    w = np.clip(w, -f32max, f32max)   # huge eigenvalues of diverging iterates
    return w.astype(np.float32), v.astype(np.float32)


def _pinv_psd(A, rcond: float = 1e-6) -> np.ndarray:
    """Pseudo-inverse of a PSD matrix via host eigh (scipy.linalg.pinv
    analogue, decompose.py:149-152)."""
    w, v = _host_eigh(A)
    cutoff = rcond * np.max(np.abs(w))
    inv_w = np.zeros_like(w)
    nz = w > cutoff
    inv_w[nz] = 1.0 / w[nz]
    # explicit f32 contract regardless of the eigh path's working dtype
    return ((v * inv_w) @ v.T).astype(np.float32)


@jax.jit
@f32_matmuls
def _itq_moments(feature: jax.Array):
    Y_mean = jnp.mean(feature, axis=0)
    G = feature - Y_mean
    GtG = G.T @ G
    return Y_mean, G, 0.5 * (GtG + GtG.T)


@jax.jit
@f32_matmuls
def _itq_step_a(G: jax.Array, GtG: jax.Array, PG: jax.Array, UU: jax.Array):
    """Device half-step: M = PG Gᵀ UU and the (d x d) projected Gram whose
    top-k eigenvectors give the rank truncation."""
    S = G.T @ UU                                  # (d, d) MXU over N
    M = PG @ S
    XtX = M.T @ GtG @ M
    return M, 0.5 * (XtX + XtX.T)


@jax.jit
@f32_matmuls
def _itq_step_b(G: jax.Array, M: jax.Array, Vk: jax.Array, U_mean: jax.Array,
                Z: jax.Array, lam: jax.Array):
    """Device half-step: apply the truncation and the closed-form ReLU
    regression (decompose.py:204-247)."""
    T = M @ Vk @ Vk.T                             # = PGGᵀ · trunc_k(G M)
    RU = G @ T + U_mean
    U = lstsq.solve_relu(RU, Z, lam)
    U_mean2 = jnp.mean(U, axis=0)
    return T, U - U_mean2, U_mean2


@functools.partial(jax.jit, static_argnames=("lambdas", "iters"))
@f32_matmuls
def _itq_loop_device(G, GtG, PG, Z, Y_mean, rank,
                     lambdas: tuple[float, ...], iters: tuple[int, ...]):
    """The whole ITQ alternating schedule as ONE device program: eigh runs
    on-chip inside a fori_loop, so a 50-iteration solve costs one dispatch
    instead of ~100 host<->device round-trips over the tunnel (~10 s/layer
    saved at VGG scale). Tracks the last finite (T, U_mean) so a diverging
    tail can be salvaged exactly like the host path.

    `rank` is a TRACED device scalar: the rank truncation is applied as an
    eigenvector mask (V diag(m) Vᵀ, m = top-`rank` positions) instead of a
    static column slice, so every layer of the same width d shares ONE
    compiled program. With rank static, each distinct layer rank recompiled
    this eigh-in-loop program (~20 s compile at d=512) — 12 compiles per 3C
    run dominated its decomposition wall. The loop body itself runs in
    ~11 ms/iteration at d=512."""
    d = G.shape[1]
    sel = jnp.arange(d) >= d - jnp.asarray(rank, jnp.int32)

    def one_iter(carry, lam):
        UU, U_mean, T_good, Um_good, ok = carry
        S = G.T @ UU                                  # (d, d) MXU over N
        M = PG @ S
        XtX = M.T @ GtG @ M
        XtX = 0.5 * (XtX + XtX.T)
        finite_in = jnp.isfinite(XtX).all()
        _, v = jnp.linalg.eigh(jnp.where(finite_in, XtX, jnp.eye(d)))
        # top-rank projector V diag(sel) Vᵀ (eigh orders ascending)
        T = M @ ((v * sel.astype(v.dtype)) @ v.T)
        RU = G @ T + U_mean
        U = lstsq.solve_relu(RU, Z, lam)
        U_mean2 = jnp.mean(U, axis=0)
        ok_now = (finite_in & jnp.isfinite(T).all()
                  & jnp.isfinite(U_mean2).all())
        T_good = jnp.where(ok_now, T, T_good)
        Um_good = jnp.where(ok_now, U_mean2, Um_good)
        return (U - U_mean2, U_mean2, T_good, Um_good, ok & ok_now)

    carry = (G, Y_mean, jnp.zeros((d, d), G.dtype), Y_mean, jnp.bool_(True))
    for lam, n_it in zip(lambdas, iters):
        lam = jnp.float32(lam)
        carry = jax.lax.fori_loop(0, n_it,
                                  lambda _, c: one_iter(c, lam), carry)
    _, _, T_good, Um_good, all_ok = carry
    return T_good, Um_good, all_ok


def _itq_solve_T(feature, gt_feature, rank: int,
                 lambdas: tuple[float, ...], iters: tuple[int, ...]):
    """Core ITQ alternating solve. Returns (T, Y_mean, U_mean).

    feature: (N, d) current responses; gt_feature: (N, d) ground truth.
    Alternates (a) rank-k projection of the ridge solution U ≈ G T with
    (b) the closed-form ReLU regression (decompose.py:204-247), fully
    on-device (`_itq_loop_device`); only the pinv of the (d x d) Gram is
    computed on host in f64 up front (decompose.py:149-152 pins scipy
    pinv(…, 1e-6)). No N-sized SVD anywhere in the loop.
    """
    _t0 = time.perf_counter()
    feature = jnp.asarray(feature, jnp.float32)
    Z = jnp.maximum(jnp.asarray(gt_feature, jnp.float32), 0.0)
    Y_mean, G, GtG = _itq_moments(feature)
    _t0 = _tprint("itq.moments", _t0, GtG)
    PG = jnp.asarray(_pinv_psd(np.asarray(GtG)))
    _t0 = _tprint("itq.pinv_host", _t0, PG)
    T, U_mean, all_ok = _itq_loop_device(G, GtG, PG, Z, Y_mean, rank,
                                         tuple(lambdas), tuple(iters))
    _t0 = _tprint("itq.als_loop", _t0, T, U_mean)
    T_h, Um_h = np.asarray(T), np.asarray(U_mean)
    if not (np.isfinite(T_h).all() and np.isfinite(Um_h).all()) or \
            not np.abs(T_h).any():
        raise np.linalg.LinAlgError("ITQ ALS diverged with no finite iterate")
    if not bool(all_ok):
        print("[itq] ALS diverged mid-schedule; salvaged last finite iterate")
    return T, Y_mean, U_mean


def _itq_solve_T_host(feature, gt_feature, rank: int,
                      lambdas: tuple[float, ...], iters: tuple[int, ...]):
    """Host-stepped variant of `_itq_solve_T` (eigh per iteration on host in
    f64). Kept as the numerical oracle for the fused device loop."""
    feature = jnp.asarray(feature, jnp.float32)
    Z = jnp.maximum(jnp.asarray(gt_feature, jnp.float32), 0.0)
    Y_mean, G, GtG = _itq_moments(feature)
    PG = jnp.asarray(_pinv_psd(GtG))

    UU, U_mean = G, Y_mean
    T = None
    last_good = None                              # (T, Y_mean, U_mean)
    it_count = 0
    for lam, n_it in zip(lambdas, iters):
        lam = jnp.float32(lam)
        for _ in range(n_it):
            M, XtX = _itq_step_a(G, GtG, PG, UU)
            XtX_h = np.asarray(XtX)
            if not np.isfinite(XtX_h).all():
                # ALS diverged: salvage the last finite iterate (the
                # reference would emit garbage here and rely on epscheck
                # prints, decompose.py:158-161; we stop at the divergence)
                if last_good is not None:
                    return last_good
                raise np.linalg.LinAlgError("ITQ ALS diverged at iteration "
                                            f"{it_count}")
            _, v = _host_eigh(XtX_h)
            Vk = jnp.asarray(v[:, -rank:])        # top-k right singular vecs
            T, UU, U_mean = _itq_step_b(G, M, Vk, U_mean, Z, lam)
            it_count += 1
            if it_count % 5 == 0:
                if np.isfinite(np.asarray(U_mean)).all():
                    last_good = (T, Y_mean, U_mean)
    return T, Y_mean, U_mean


@f32_matmuls
def itq_decompose(feature: np.ndarray | jax.Array, gt_feature, weight, rank: int,
                  bias=None, Wr=None, lambdas: tuple[float, ...] = (0.1, 1.0),
                  iters: tuple[int, ...] = (30, 20),
                  true_shape: tuple[int, int] | None = None) -> ITQResult:
    """ReLU-aware channel decomposition (decompose.py:163-319).

    feature (N, d): responses of the current (already spatially decomposed)
    conv; gt_feature (N, d): ground-truth responses; weight: the H conv
    (d, r, 1, kw) to fold the left factor into; Wr: the merged VHr weights
    (d, c, kh, kw) for the asymmetric overwrite. Produces the rank-`rank`
    factorisation d -> rank (folded into H / Wr) plus a 1x1 conv rank -> d.

    `true_shape=(d, c)` marks the inputs as bucket-padded (zero columns /
    rows beyond the true widths, produced by `vh_decompose(pad_to=...)`):
    the solve and fold run at the shared padded shapes (one compiled
    program for the whole model) and the results are sliced back to true
    shapes on host. `bias` and `Wr` are required in this mode.
    """
    feature = jnp.asarray(feature, jnp.float32)
    gt_feature = jnp.asarray(gt_feature, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)
    d = feature.shape[1]
    assert weight.shape[0] == d, (weight.shape, d)

    T, Y_mean, U_mean = _itq_solve_T(feature, gt_feature, rank, tuple(lambdas),
                                     tuple(iters))

    if true_shape is not None:
        assert bias is not None and Wr is not None
        d_true, c_true = true_shape
        r_pad = weight.shape[1]
        _t0 = time.perf_counter()
        L64, s64, Rt64 = np.linalg.svd(np.asarray(T, np.float64),
                                       full_matrices=False)
        _t0 = _tprint("itq.svd_host", _t0)
        L_p = np.zeros((d, r_pad), np.float32)
        L_p[:, :rank] = L64[:, :rank]
        R_p = np.zeros((r_pad, d), np.float32)
        R_p[:rank] = (s64[:rank, None] * Rt64[:rank]).astype(np.float32)
        W1p, W2p, Bp, W12p, feat2 = _itq_fold_fused(
            weight, jnp.asarray(Wr, jnp.float32), jnp.asarray(L_p),
            jnp.asarray(R_p), T, Y_mean, U_mean,
            jnp.asarray(bias, jnp.float32), feature)
        _t0 = _tprint("itq.fold", _t0, W12p, feat2)
        return ITQResult(W1=np.asarray(W1p)[:rank, :rank],
                         W2=np.asarray(W2p)[:d_true, :rank],
                         B=np.asarray(Bp)[:d_true],
                         W12=np.asarray(W12p)[:d_true, :c_true],
                         feat2=feat2)

    # final factor split on host in f64 (device SVD avoided, see _host_eigh)
    _t0 = time.perf_counter()
    L64, s64, Rt64 = np.linalg.svd(np.asarray(T, np.float64),
                                   full_matrices=False)
    _t0 = _tprint("itq.svd_host", _t0)
    L = jnp.asarray(L64[:, :rank], jnp.float32)            # (d, rank)
    R = jnp.asarray(s64[:rank, None] * Rt64[:rank], jnp.float32)  # (rank, d)

    def fold_left(Wfull):
        # (d, a, b, c) -> contract output channels with L -> (rank, a, b, c)
        Wt = jnp.transpose(Wfull, (1, 2, 3, 0)).reshape(-1, d)
        out = Wt @ L                               # (abc, rank)
        out = out.reshape(Wfull.shape[1:] + (rank,))
        return jnp.transpose(out, (3, 0, 1, 2))

    W1 = fold_left(weight)
    Wr_arr = weight if Wr is None else jnp.asarray(Wr, jnp.float32)
    Wt = jnp.transpose(Wr_arr, (1, 2, 3, 0)).reshape(-1, d)
    W12 = (Wt @ L @ R).reshape(Wr_arr.shape[1:] + (d,))
    W12 = jnp.transpose(W12, (3, 0, 1, 2))

    W2 = R.T.reshape(d, rank, 1, 1)
    B = -Y_mean @ T + U_mean
    if bias is not None:
        # the producer's bias enters the factorised response through T:
        # chain output = (feature - b) @ T + B_total must reproduce
        # feature @ T + (U_mean - Y_mean @ T), hence B_total += b @ T.
        B = B + jnp.asarray(bias, jnp.float32) @ T
    return ITQResult(W1=W1, W2=W2, B=B, W12=W12)
