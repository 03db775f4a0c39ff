"""Least-squares reconstruction on device.

TPU-native replacement for the reference's sklearn LinearRegression /
Ridge reconstruction (lib/decompose.py:636-669 `fc_kernel`): centered normal
equations reduced with one big MXU matmul, solved by Cholesky. The Gram
reduction is the only O(N) work, so it also shards cleanly across devices
(psum the Gram/cross matrices — see parallel/sharded.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def f32_matmuls(fn):
    """Trace `fn` with full-f32 matmul precision. TPU matmuls default to
    bf16 passes; fine for the replay forwards (proven selection-identical,
    BENCH_NOTES), but the SOLVER iterations — Gram reductions, the ITQ
    alternating loop — amplify the truncation noise until the reference's
    epscheck bounds trip (observed: every ITQ stage of a trained net rejected
    on TPU, none on CPU). Solver matrices are (d x d)-tiny, so full precision
    costs nothing next to the replays."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped


class LinearFactors(NamedTuple):
    """Cached Cholesky factorisation of centered X'X for repeated solves
    against new targets (ALS loops refit the same design matrix dozens of
    times — decompose.py:671-685 refits from scratch each iteration)."""

    chol: jax.Array       # lower Cholesky of (XcᵀXc + jitter·I)
    x_mean: jax.Array     # (d,)
    n: int


def _sym(a: jax.Array) -> jax.Array:
    return 0.5 * (a + a.T)


@functools.partial(jax.jit, static_argnames=("ridge", "jitter"))
@f32_matmuls
def factor(X: jax.Array, ridge: float = 0.0, jitter: float = 1e-6) -> LinearFactors:
    """Factor the centered Gram matrix of X (N, d).

    Jitter scales with trace(G) (an upper bound on the largest eigenvalue)
    so rank-deficient designs (N < d, collinear channels) stay Cholesky-
    factorisable in f32 — mean-eigenvalue scaling underflows there.
    """
    x_mean = jnp.mean(X, axis=0)
    Xc = X - x_mean
    G = _sym(Xc.T @ Xc)
    scale = jnp.maximum(jnp.trace(G), 1e-30)
    G = G + (ridge + jitter * scale) * jnp.eye(G.shape[0], dtype=G.dtype)
    chol = jax.scipy.linalg.cholesky(G, lower=True)
    return LinearFactors(chol=chol, x_mean=x_mean, n=X.shape[0])


@jax.jit
@f32_matmuls
def solve(f: LinearFactors, X: jax.Array, Y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Solve for (W, b) with cached factors: Y ≈ X @ W.T + b.

    Returns W (n_out, d) and b (n_out,) — same contract as the reference's
    fc_kernel (decompose.py:636: "return: n c").
    """
    y_mean = jnp.mean(Y, axis=0)
    C = (X - f.x_mean).T @ (Y - y_mean)           # (d, n_out)
    Wt = jax.scipy.linalg.cho_solve((f.chol, True), C)
    W = Wt.T
    b = y_mean - W @ f.x_mean
    return W, b


@functools.partial(jax.jit, static_argnames=("ridge", "fit_intercept"))
@f32_matmuls
def fit_linear(X: jax.Array, Y: jax.Array, ridge: float = 0.0,
               fit_intercept: bool = True) -> tuple[jax.Array, jax.Array]:
    """One-shot least squares: W, b = argmin ||X W.T + b - Y||^2 (+ ridge)."""
    if not fit_intercept:
        G = _sym(X.T @ X)
        scale = jnp.maximum(jnp.trace(G), 1e-30)
        G = G + (ridge + 1e-6 * scale) * jnp.eye(G.shape[0], dtype=G.dtype)
        C = X.T @ Y
        W = jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(G, lower=True), True), C).T
        return W, jnp.zeros(Y.shape[1] if Y.ndim > 1 else 1, X.dtype)
    f = factor(X, ridge=ridge)
    return solve(f, X, Y)


@jax.jit
@f32_matmuls
def solve_relu(RU: jax.Array, Z: jax.Array, lam: jax.Array | float) -> jax.Array:
    """Closed-form per-element minimiser of |relu(u)-z|^2 + λ|u-ru|^2
    (the ReLU-aware ALS inner step; math of decompose.py:51-59)."""
    u0 = jnp.minimum(RU, 0.0)
    cost0 = Z ** 2 + lam * (u0 - RU) ** 2
    u1 = jnp.maximum((lam * RU + Z) / (lam + 1.0), 0.0)
    cost1 = (u1 - Z) ** 2 + lam * (u1 - RU) ** 2
    return jnp.where(cost0 <= cost1, u0, u1)
