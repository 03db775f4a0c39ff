"""CPU numpy/sklearn oracle implementations of the solver semantics.

These re-state the *math* of the reference algorithms (lib/decompose.py) in
plain numpy/sklearn and exist only as test oracles: the device solvers in
ops/{lasso,lstsq,lowrank}.py are validated against these (BASELINE config 1:
"CPU numpy/sklearn parity"). Not used in the pipeline.
"""
from __future__ import annotations

import numpy as np


def relu(x):
    return np.maximum(x, 0.0)


def rel_error(a, b):
    return np.mean((a - b) ** 2) ** 0.5 / np.mean(np.asarray(a) ** 2) ** 0.5


def lstsq_fit(X, Y, fit_intercept=True):
    """sklearn.LinearRegression equivalent via numpy lstsq."""
    if fit_intercept:
        xm, ym = X.mean(0), Y.mean(0)
        W, *_ = np.linalg.lstsq(X - xm, Y - ym, rcond=None)
        return W.T, ym - W.T @ xm
    W, *_ = np.linalg.lstsq(X, Y, rcond=None)
    return W.T, np.zeros(Y.shape[1] if Y.ndim > 1 else 1)


def sklearn_lasso_support(Z, y, alpha, seed=0):
    from sklearn.linear_model import Lasso

    solver = Lasso(alpha=alpha, selection="cyclic", tol=1e-8, max_iter=5000)
    solver.fit(Z, y)
    return solver.coef_ != 0.0, solver.coef_


def nonlinear_fc(X, Y, lambdas=(0.1, 1.0), iters=(30, 20)):
    """Alternating least squares + closed-form ReLU solve
    (math of decompose.py:671-685)."""
    U = Y.copy()
    Z = relu(Y)
    W = b = None
    for lam, n_it in zip(lambdas, iters):
        for _ in range(n_it):
            W, b = lstsq_fit(X, U)
            RU = X @ W.T + b
            U = solve_relu(RU, Z, lam)
    return W, b


def solve_relu(RU, Z, lam):
    u0 = np.minimum(RU, 0.0)
    c0 = Z ** 2 + lam * (u0 - RU) ** 2
    u1 = relu((lam * RU + Z) / (lam + 1.0))
    c1 = (u1 - Z) ** 2 + lam * (u1 - RU) ** 2
    return np.where(c0 <= c1, u0, u1)


def vh_svd(W, rank):
    """Plain (data-free) spatial SVD: W (n,c,kh,kw) -> V, H, VHr."""
    n, c, kh, kw = W.shape
    M = W.transpose(1, 2, 0, 3).reshape(c * kh, n * kw)
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    Uk, Hk = U[:, :rank], s[:rank, None] * Vt[:rank]
    VHr = (Uk @ Hk).reshape(c, kh, n, kw).transpose(2, 0, 1, 3)
    V = Uk.reshape(c, 1, kh, rank).transpose(3, 0, 2, 1)
    H = Hk.reshape(rank, n, kw, 1).transpose(1, 0, 3, 2)
    return V, H, VHr


def itq_reference(feature, gt_feature, rank, lambdas=(0.1, 1.0), iters=(30, 20)):
    """Direct (N-sized SVD) statement of the ITQ alternating solve
    (math of decompose.py:163-248) — the slow-but-obvious oracle for the
    device implementation's eigh-based truncation."""
    Z = relu(gt_feature)
    Y_mean = feature.mean(0)
    G = feature - Y_mean
    PG = np.linalg.pinv(G.T @ G, rcond=1e-6)
    PGGt = PG @ G.T
    UU, U_mean = G.copy(), Y_mean.copy()
    T = None
    for lam, n_it in zip(lambdas, iters):
        for _ in range(n_it):
            X = G @ (PGGt @ UU)
            L, s, R = np.linalg.svd(X, full_matrices=False)
            Tfull = L[:, :rank] @ np.diag(s[:rank]) @ R[:rank]
            T = PGGt @ Tfull
            RU = G @ T + U_mean
            U = solve_relu(RU, Z, lam)
            U_mean = U.mean(0)
            UU = U - U_mean
    return T, Y_mean, U_mean


def conv_response_at_points(Xp, W2):
    """Y[n, o] = sum_{c,kh,kw} Xp[n,c,kh,kw] * W2[o,c,kh,kw]."""
    return np.einsum("nchw,ochw->no", Xp, W2)


def pca_rank_probe(X, energy=0.95):
    """PCA-based rank probe: smallest k capturing `energy` of the variance
    (capability parity with the reference's pca/YYT helpers,
    decompose.py:34-79, used to pick decomposition ranks from data)."""
    Xc = X - X.mean(0)
    s = np.linalg.svd(Xc, compute_uv=False)
    e = np.cumsum(s ** 2)
    return int(np.searchsorted(e / e[-1], energy) + 1)


def yyt_spectrum(Y):
    """Eigen-spectrum of the response Gram YYᵀ-style probe (decompose.py
    YYT): descending eigenvalues of YᵀY / N."""
    G = Y.T @ Y / Y.shape[0]
    w = np.linalg.eigvalsh(0.5 * (G + G.T))
    return w[::-1]


def yyt_components(Y, n_components=None):
    """(P, Qᵀ) projection pair onto the top principal subspace of Y (N, d) —
    the reference's YYT helper (decompose.py:61-79: sklearn PCA components_.T
    and components_). P: (d, d'), QT: (d', d); P @ QT projects responses onto
    the subspace."""
    Yc = Y - Y.mean(0)
    _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
    k = Vt.shape[0] if n_components is None else int(n_components)
    return Vt[:k].T, Vt[:k]


def nnls(A, B):
    """Row-wise nonnegative least squares: X[i] = argmin_{x>=0} |A x - B[i]|
    (decompose.py:361 — scipy.optimize.nnls mapped over B's rows)."""
    from scipy import optimize

    B = np.atleast_2d(B)
    return np.stack([optimize.nnls(A, b)[0] for b in B])
