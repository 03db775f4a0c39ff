"""LASSO channel selection on device.

TPU-native redesign of the reference's hot solver (lib/decompose.py:386-634
`dictionary`): sklearn coordinate descent + sequential alpha bisection is
replaced by

  1. one MXU batched matmul building the per-channel response matrix
     Z[:, i] = X_i ⊛ W2_i  (decompose.py:428-437),
  2. a single Gram reduction G = ZᵀZ, b = Zᵀy (the only O(N) work),
  3. Gram-based (covariance-update) cyclic coordinate descent, vmapped over a
     whole *grid* of alphas at once, and
  4. grid refinement until some alpha's support size lands in
     [rank, rank + rank_tol*rank] — the reference's bisection target
     (decompose.py:487-525) found in O(1) parallel rounds instead of O(log)
     sequential sklearn fits.

The CD solve itself matches sklearn's objective
  min_beta 1/(2N) ||y - Z beta||^2 + alpha ||beta||_1
so support sets agree with the reference within numerical tolerance
(deterministic cyclic order instead of selection='random').
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.utils.runtime import heartbeat

from channel_pruning_tpu.ops.lstsq import f32_matmuls


class LassoGram(NamedTuple):
    G: jax.Array       # (c, c)  ZᵀZ
    b: jax.Array       # (c,)    Zᵀy
    n_samples: int     # N rows of Z


@f32_matmuls
def build_channel_response(X: jax.Array, W2: jax.Array) -> jax.Array:
    """Z columns are per-input-channel partial responses of the next layer.

    X: (N, c, kh, kw) input patches; W2: (n, c, kh, kw) next-layer weights.
    Returns Z: (N*n, c) with Z[:, i] = vec(X[:, i] · W2[:, i]ᵀ)
    (decompose.py:428-437, as one batched MXU matmul).
    """
    N, c = X.shape[0], X.shape[1]
    n = W2.shape[0]
    xr = jnp.transpose(X.reshape(N, c, -1), (1, 0, 2))        # (c, N, khkw)
    wr = jnp.transpose(W2.reshape(n, c, -1), (1, 2, 0))       # (c, khkw, n)
    Z = jax.lax.dot_general(xr, wr, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (c, N, n)
    return Z.reshape(c, N * n).T


@jax.jit
@f32_matmuls
def lasso_gram(Z: jax.Array, y: jax.Array) -> LassoGram:
    G = Z.T @ Z
    G = 0.5 * (G + G.T)
    return LassoGram(G=G, b=Z.T @ y, n_samples=Z.shape[0])


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
@f32_matmuls
def cd_solve(G: jax.Array, b: jax.Array, alpha_n: jax.Array,
             beta0: jax.Array, n_sweeps: int = 200, tol: float = 1e-8
             ) -> jax.Array:
    """Cyclic coordinate descent on the Gram system for one alpha.

    alpha_n = alpha * n_samples (threshold in Gram units). Early exit when
    the largest coordinate move in a sweep drops below tol * max|beta|.
    """
    c = G.shape[0]
    diag = jnp.diagonal(G)
    safe_diag = jnp.where(diag > 0, diag, 1.0)

    def coord(j, carry):
        beta, q, max_delta = carry
        # q = G @ beta maintained incrementally
        cj = b[j] - q[j] + diag[j] * beta[j]
        bj = jnp.sign(cj) * jnp.maximum(jnp.abs(cj) - alpha_n, 0.0) / safe_diag[j]
        bj = jnp.where(diag[j] > 0, bj, 0.0)
        delta = bj - beta[j]
        q = q + G[:, j] * delta
        beta = beta.at[j].set(bj)
        return beta, q, jnp.maximum(max_delta, jnp.abs(delta))

    def sweep(state):
        beta, q, _, it = state
        beta, q, max_delta = jax.lax.fori_loop(0, c, coord, (beta, q, 0.0))
        return beta, q, max_delta, it + 1

    def cont(state):
        beta, _, max_delta, it = state
        scale = jnp.maximum(jnp.max(jnp.abs(beta)), 1e-12)
        return jnp.logical_and(it < n_sweeps,
                               jnp.logical_or(it == 0, max_delta > tol * scale))

    beta0 = beta0.astype(G.dtype)
    q0 = G @ beta0
    beta, _, _, _ = jax.lax.while_loop(cont, sweep, (beta0, q0, jnp.inf, 0))
    return beta


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
@f32_matmuls
def cd_solve_grid(G: jax.Array, b: jax.Array, alphas_n: jax.Array,
                  n_sweeps: int = 200) -> jax.Array:
    """Solve the full alpha grid in parallel: (n_alpha, c) betas."""
    beta0 = jnp.zeros((alphas_n.shape[0], G.shape[0]), G.dtype)
    return jax.vmap(lambda a, b0: cd_solve(G, b, a, b0, n_sweeps))(alphas_n, beta0)


def support_mask(betas: jax.Array, rel_eps: float = 1e-6) -> jax.Array:
    """Nonzero mask with a relative threshold: coordinate-descent paths that
    differ only in stopping order leave ~1e-7 residues on coordinates that a
    stricter run keeps at exactly 0 — count both as inactive."""
    scale = jnp.maximum(jnp.max(jnp.abs(betas), axis=-1, keepdims=True), 1e-30)
    return jnp.abs(betas) > rel_eps * scale


def support_sizes(betas: jax.Array) -> jax.Array:
    return jnp.sum(support_mask(betas), axis=-1)


def _solve_grid(G: jax.Array, b: jax.Array, alphas_n: jax.Array,
                n_sweeps: int) -> jax.Array:
    """Dispatch the alpha-grid CD solve: fused Pallas kernel on TPU
    (kernels/lasso_cd.py), pure-XLA fallback elsewhere.

    The VMEM-resident kernel pins the whole (c x c) Gram on-chip; beyond
    c=1024 (4 MB) it no longer fits the 16 MB VMEM budget (observed
    scoped-vmem OOM at c=2048 on ResNet-50 res5 gates), so large problems
    take the HBM-streaming kernel (G rows DMA'd in double-buffered 8-row
    blocks — ~8x faster than the XLA fallback at c=2048)."""
    from channel_pruning_tpu.kernels import lasso_cd

    if lasso_cd.pallas_available():
        if G.shape[0] <= 1024:
            return lasso_cd.cd_solve_grid_pallas(G, b, alphas_n,
                                                 n_sweeps=n_sweeps)
        return lasso_cd.cd_solve_grid_pallas_hbm(G, b, alphas_n,
                                                 n_sweeps=n_sweeps)
    return cd_solve_grid(G, b, alphas_n, n_sweeps=n_sweeps)


def search_alpha(gram: LassoGram, rank: int, rank_tol: float,
                 alpha0: float = 1e-3, grid_size: int = 16,
                 max_rounds: int = 8, n_sweeps: int = 200,
                 prefer: str = "top") -> tuple[np.ndarray, float, int]:
    """Find a support of size in [rank, rank + rank_tol*rank].

    Mirrors the reference's termination semantics (decompose.py:487-525:
    grow `right` until support < rank, then bisect on support size) but each
    round solves a whole geometric/linear grid of alphas on device in
    parallel. Returns (bool mask, alpha, support_size).

    `prefer` picks which end of the tolerance band to refine toward:
    * "top" — largest in-band support: more survivors give strictly better
      reconstruction at the same speed target (the planner accounts for the
      overshoot when hitting a requested ratio).
    * "bottom" — smallest in-band support (== `rank` when reachable): for
      runs targeting a released structure table, where the channel count
      itself is the ground truth to reproduce.
    """
    c = int(gram.G.shape[0])
    if rank >= c:
        return np.ones(c, bool), 0.0, c
    lbound = rank
    rbound = rank + (rank_tol if rank_tol >= 1 else rank_tol * rank)
    N = gram.n_samples
    top = prefer == "top"

    # round 0: geometric sweep to bracket the target support
    alphas = alpha0 * (2.0 ** np.arange(-2, grid_size - 2, dtype=np.float64))
    lo, hi = 0.0, None
    best_cand = None  # (support, mask, alpha) — best in-band seen so far
    best_over = None  # (support, |beta|, alpha) — smallest support >= rank,
    #                   kept for the exact-count trim on the "bottom" path
    refines = 0       # each refinement is a full grid solve — bound them
    for round_i in range(max_rounds):
        heartbeat()   # each grid solve can take seconds-to-minutes cold
        a = jnp.asarray(alphas * N, dtype=gram.G.dtype)
        betas = _solve_grid(gram.G, gram.b, a, n_sweeps=n_sweeps)
        supports = np.asarray(support_sizes(betas))
        if not top:
            ge = np.where(supports >= lbound)[0]
            if ge.size:
                gi = ge[supports[ge].argmin()]
                if best_over is None or supports[gi] < best_over[0]:
                    best_over = (int(supports[gi]),
                                 np.abs(np.asarray(betas[gi])),
                                 float(alphas[gi]))
        in_band = np.where((supports >= lbound) & (supports <= rbound))[0]
        if in_band.size:
            pick = np.argmax if top else np.argmin
            bi = in_band[pick(supports[in_band])]
            better = (best_cand is None or
                      (supports[bi] > best_cand[0] if top
                       else supports[bi] < best_cand[0]))
            if better:
                best_cand = (int(supports[bi]),
                             np.asarray(support_mask(betas[bi])),
                             float(alphas[bi]))
            if (best_cand[0] >= int(rbound)) if top else \
                    (best_cand[0] <= lbound):
                break
            refines += 1
            if refines > 2:
                break
            # refine between the best in-band alpha and the nearest alpha
            # just outside the band on the preferred side (support is
            # ~decreasing in alpha)
            if top:
                over_i = np.where(supports > rbound)[0]
                a_hi = best_cand[2]
                a_lo = float(alphas[over_i[supports[over_i].argmin()]]) \
                    if over_i.size else max(lo, a_hi / 2.0)
            else:
                under_i = np.where(supports < lbound)[0]
                a_lo = best_cand[2]
                a_hi = float(alphas[under_i[supports[under_i].argmax()]]) \
                    if under_i.size else (hi if hi is not None else a_lo * 2.0)
            if a_hi - a_lo <= 1e-12 * max(a_hi, 1e-30):
                break
            alphas = np.linspace(a_lo, a_hi, grid_size + 2,
                                 dtype=np.float64)[1:-1]
            continue
        # bracket: largest alpha with support > rbound, smallest with < lbound
        over = np.where(supports > rbound)[0]   # alpha too small
        under = np.where(supports < lbound)[0]  # alpha too big
        if over.size:
            lo = float(alphas[over[supports[over].argmin()]])
        if under.size:
            hi = float(alphas[under[supports[under].argmax()]])
        if hi is None:
            alphas = alphas * (2.0 ** grid_size)  # keep growing right
            continue
        if not over.size:
            lo = hi / (2.0 ** grid_size)
        # refine linearly inside the bracket
        alphas = np.linspace(lo, hi, grid_size + 2, dtype=np.float64)[1:-1]
    if not top and (best_cand is None or best_cand[0] != lbound):
        # exact-count path for released-table structural fidelity:
        # (a) no alpha hits `rank` exactly (support jumps over the band) —
        #     take the smallest support >= rank and drop its smallest-|beta|
        #     channels (the standard LASSO-path order);
        # (b) the reachable support tops out BELOW rank (dead/degenerate
        #     channels produce all-zero response columns, common on
        #     random-weight nets) — top up with the highest-energy excluded
        #     channels (they reconstruct to ~0 weight, structure preserved).
        if best_over is not None:
            absb, alpha = best_over[1], best_over[2]
            mask = np.zeros(c, bool)
            mask[np.argsort(-absb)[:rank]] = True
            return mask, alpha, int(mask.sum())
        dist = np.abs(supports - lbound)
        bi = int(np.argmin(dist))
        mask = np.asarray(support_mask(betas[bi])).copy()
        short = rank - int(mask.sum())
        if short > 0:
            energy = np.where(mask, -np.inf,
                              np.asarray(jnp.diagonal(gram.G), np.float64))
            mask[np.argsort(-energy)[:short]] = True
        return mask, float(alphas[bi]), int(mask.sum())
    if best_cand is not None:
        return best_cand[1], best_cand[2], best_cand[0]
    # fall back to nearest support
    dist = np.minimum(np.abs(supports - lbound), np.abs(supports - rbound))
    best = int(np.argmin(dist))
    mask = np.asarray(support_mask(betas[best]))
    return mask, float(alphas[best]), int(supports[best])


@functools.partial(jax.jit, static_argnames=(
    "rank_tol", "alpha0", "grid_size", "max_rounds", "n_sweeps",
    "prefer"))
def _fused_search(G: jax.Array, b: jax.Array, N: jax.Array, rank: jax.Array,
                  rank_tol: float, alpha0: float, grid_size: int,
                  max_rounds: int, n_sweeps: int, prefer: str):
    """The whole alpha search as ONE device program (lax.while_loop over
    rounds), mirroring `search_alpha`'s probe sequence: geometric bracket →
    linear refinement → band pick → exact-count trim/top-up. The host-stepped
    path costs ~2-4 grid dispatches plus per-round support fetches — ~10-20
    tunnel round trips per layer; this costs exactly one.

    Differences vs the host path, by design: grid endpoints are computed in
    f32 on device (host uses f64 — borderline supports can differ by one
    probe), and the refinement runs through all `max_rounds` iterations'
    worth of state updates with `done` masking instead of early exit.
    Parity is pinned by tests (same masks on a battery of problems; the
    exact-count path returns exactly `rank`)."""
    c = G.shape[0]
    dt = G.dtype
    # `rank` is a DEVICE scalar (not static): the keep target is the one
    # per-layer variation in an otherwise shape-identical program, and
    # making it dynamic lets every same-shaped layer share ONE compile
    # (from-scratch VGG pays 7 fused-solve compiles instead of 10+)
    lbound = jnp.asarray(rank, jnp.int32)
    rbound_f = (lbound.astype(jnp.float32)
                + (rank_tol if rank_tol >= 1
                   else rank_tol * lbound.astype(jnp.float32)))
    rbound = rbound_f
    top = prefer == "top"
    diag = jnp.diagonal(G)

    def grid_supports(alphas):
        # _solve_grid so the fused program uses the same Pallas CD kernels
        # as the host-stepped path (VMEM <=1024 / HBM-streaming beyond) —
        # cd_solve_grid here would silently drop to the ~8x-slower XLA
        # fallback at ResNet res5 scale (c=2048)
        betas = _solve_grid(G, b, (alphas * N).astype(dt),
                            n_sweeps=n_sweeps)
        return betas, support_sizes(betas).astype(jnp.int32)

    alphas0 = jnp.float32(alpha0) * (2.0 ** jnp.arange(-2, grid_size - 2,
                                                       dtype=jnp.float32))
    BIG = jnp.int32(10 ** 9)
    F = jnp.bool_(False)
    state = dict(
        alphas=alphas0,
        lo=jnp.float32(0.0), hi=jnp.float32(0.0), hi_found=F,
        cand_support=jnp.int32(-1), cand_mask=jnp.zeros((c,), bool),
        cand_alpha=jnp.float32(0.0), cand_found=F,
        over_support=BIG, over_absb=jnp.zeros((c,), dt),
        over_alpha=jnp.float32(0.0), over_found=F,
        last_betas=jnp.zeros((grid_size, c), dt),
        last_supports=jnp.zeros((grid_size,), jnp.int32),
        refines=jnp.int32(0), round_i=jnp.int32(0), done=F)

    def body(s):
        betas, supports = grid_supports(s["alphas"])
        sup_f = supports.astype(jnp.float32)
        in_band = (supports >= lbound) & (sup_f <= rbound)
        any_band = jnp.any(in_band)

        # --- best_over update (bottom path): smallest support >= rank
        ge = supports >= lbound
        sup_ge = jnp.where(ge, supports, BIG)
        gi = jnp.argmin(sup_ge)
        over_better = ((not top) & jnp.any(ge)
                       & (sup_ge[gi] < s["over_support"]))
        over_support = jnp.where(over_better, supports[gi], s["over_support"])
        over_absb = jnp.where(over_better, jnp.abs(betas[gi]), s["over_absb"])
        over_alpha = jnp.where(over_better, s["alphas"][gi], s["over_alpha"])

        # --- in-band candidate pick: max (top) / min (bottom) support
        sup_band = jnp.where(in_band, supports, -1 if top else BIG)
        bi = jnp.argmax(sup_band) if top else jnp.argmin(sup_band)
        cand_better = any_band & (
            (~s["cand_found"]) |
            ((supports[bi] > s["cand_support"]) if top
             else (supports[bi] < s["cand_support"])))
        cand_support = jnp.where(cand_better, supports[bi], s["cand_support"])
        cand_mask = jnp.where(cand_better, support_mask(betas[bi]),
                              s["cand_mask"])
        cand_alpha = jnp.where(cand_better, s["alphas"][bi], s["cand_alpha"])
        cand_found = s["cand_found"] | cand_better

        # --- band-edge termination / refinement-budget termination
        edge = jnp.where(jnp.bool_(top),
                         cand_support >= rbound_f.astype(jnp.int32),
                         cand_support <= lbound) & cand_found
        refines = s["refines"] + jnp.where(any_band & ~edge, 1, 0)
        budget_done = refines > 2

        # --- refinement grid between best in-band alpha and the nearest
        # out-of-band alpha on the preferred side (support ~decreasing in a)
        if top:
            over_i = sup_f > rbound               # support too big -> a too small
            a_hi_r = cand_alpha
            a_lo_r = jnp.where(jnp.any(over_i),
                               s["alphas"][jnp.argmin(jnp.where(
                                   over_i, supports, BIG))],
                               jnp.maximum(s["lo"], a_hi_r / 2.0))
        else:
            under_i = supports < lbound           # support too small -> a too big
            a_lo_r = cand_alpha
            a_hi_r = jnp.where(jnp.any(under_i),
                               s["alphas"][jnp.argmax(jnp.where(
                                   under_i, supports, jnp.int32(-1)))],
                               jnp.where(s["hi_found"], s["hi"], a_lo_r * 2.0))
        degenerate = (a_hi_r - a_lo_r) <= 1e-12 * jnp.maximum(a_hi_r, 1e-30)
        t = jnp.arange(1, grid_size + 1, dtype=jnp.float32) / (grid_size + 1)
        refine_grid = a_lo_r + (a_hi_r - a_lo_r) * t

        # --- bracket update (no in-band sample this round)
        over_b = sup_f > rbound
        under_b = supports < lbound
        lo_new = jnp.where(jnp.any(over_b),
                           s["alphas"][jnp.argmin(jnp.where(over_b, supports,
                                                            BIG))], s["lo"])
        hi_new = jnp.where(jnp.any(under_b),
                           s["alphas"][jnp.argmax(jnp.where(
                               under_b, supports, jnp.int32(-1)))],
                           jnp.where(s["hi_found"], s["hi"], jnp.float32(0.0)))
        hi_found = s["hi_found"] | jnp.any(under_b)
        grow_grid = s["alphas"] * (2.0 ** grid_size)
        lo_brk = jnp.where(jnp.any(over_b), lo_new,
                           hi_new / (2.0 ** grid_size))
        bracket_grid = lo_brk + (hi_new - lo_brk) * t
        no_band_grid = jnp.where(hi_found, bracket_grid, grow_grid)

        next_alphas = jnp.where(any_band, refine_grid, no_band_grid)
        done = s["done"] | edge | (any_band & (budget_done | degenerate))
        keep_old = s["done"]

        def sel(new, old):
            return jnp.where(keep_old, old, new)

        return dict(
            alphas=sel(next_alphas, s["alphas"]),
            lo=sel(jnp.where(any_band, s["lo"], lo_new), s["lo"]),
            hi=sel(hi_new, s["hi"]),
            hi_found=sel(hi_found, s["hi_found"]),
            cand_support=sel(cand_support, s["cand_support"]),
            cand_mask=sel(cand_mask, s["cand_mask"]),
            cand_alpha=sel(cand_alpha, s["cand_alpha"]),
            cand_found=sel(cand_found, s["cand_found"]),
            over_support=sel(over_support, s["over_support"]),
            over_absb=sel(over_absb, s["over_absb"]),
            over_alpha=sel(over_alpha, s["over_alpha"]),
            over_found=sel(over_better | s["over_found"], s["over_found"]),
            last_betas=sel(betas, s["last_betas"]),
            last_supports=sel(supports, s["last_supports"]),
            refines=sel(refines, s["refines"]),
            round_i=s["round_i"] + 1,
            done=done)

    def cont(s):
        return (s["round_i"] < max_rounds) & ~s["done"]

    s = jax.lax.while_loop(cont, body, state)

    # --- final selection (device-side mirror of search_alpha's epilogue)
    order_pos = jnp.argsort(jnp.argsort(-s["over_absb"]))  # rank of each coord
    trim_mask = order_pos < lbound
    # top-up path: nearest-support mask from the last round + highest-energy
    # excluded channels until exactly `rank`
    dist = jnp.abs(s["last_supports"] - lbound)          # bottom top-up
    ni = jnp.argmin(dist)
    near_mask = support_mask(s["last_betas"][ni])
    dist2 = jnp.minimum(dist, jnp.abs(s["last_supports"].astype(jnp.float32)
                                      - rbound))          # top fallback
    ni2 = jnp.argmin(dist2)
    near_mask2 = support_mask(s["last_betas"][ni2])
    short = lbound - jnp.sum(near_mask).astype(jnp.int32)
    energy = jnp.where(near_mask, -jnp.inf, diag.astype(jnp.float32))
    epos = jnp.argsort(jnp.argsort(-energy))
    topped = near_mask | (epos < short)

    if prefer == "top":
        mask = jnp.where(s["cand_found"], s["cand_mask"], near_mask2)
        alpha = jnp.where(s["cand_found"], s["cand_alpha"],
                          s["alphas"][ni2])
    else:
        exact = s["cand_found"] & (s["cand_support"] == lbound)
        mask = jnp.where(
            exact, s["cand_mask"],
            jnp.where(s["over_found"], trim_mask, topped))
        alpha = jnp.where(
            exact, s["cand_alpha"],
            jnp.where(s["over_found"], s["over_alpha"], s["alphas"][ni]))
    return mask, alpha, jnp.sum(mask).astype(jnp.int32)


def fused_search_alpha(gram: LassoGram, rank: int, rank_tol: float,
                       alpha0: float = 1e-3, grid_size: int = 16,
                       max_rounds: int = 8, n_sweeps: int = 200,
                       prefer: str = "top"
                       ) -> tuple[np.ndarray, float, int]:
    """`search_alpha` semantics in ONE device dispatch (see _fused_search).
    Same signature/return contract; opt-in via SolveConfig.fused_search."""
    c = int(gram.G.shape[0])
    if rank >= c:
        return np.ones(c, bool), 0.0, c
    heartbeat()
    mask, alpha, support = _fused_search(
        gram.G, gram.b, jnp.float32(gram.n_samples), rank, float(rank_tol),
        float(alpha0), grid_size, max_rounds, n_sweeps, prefer)
    return np.asarray(mask), float(alpha), int(support)


def select_channels(X: np.ndarray, W2: np.ndarray, Y: np.ndarray, rank: int,
                    *, alpha0: float = 1e-3, rank_tol: float = 0.1,
                    subsample: int = 400, seed: int = 0, grid_size: int = 16,
                    max_rounds: int = 8, n_sweeps: int = 200,
                    mesh=None, prefer: str = "top", fused: bool = False,
                    ) -> tuple[np.ndarray, float, int]:
    """End-to-end channel selection for one layer.

    X: (N, c, kh, kw) patches, W2: (n, c, kh, kw), Y: (N, n) target responses.
    Row subsampling matches the reference (min(400, N//20) rows,
    decompose.py:425) but with a deterministic PRNG. With a `mesh`, the Z
    Gram reduction (n_sub*n rows) is row-sharded and psum-reduced across it;
    the (c x c) CD search then runs identically on every device.
    """
    N = X.shape[0]
    n_sub = min(subsample, max(N // 20, 1))
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, N, size=n_sub)
    Xs = jnp.asarray(X[rows], jnp.float32)
    Ys = jnp.asarray(Y[rows], jnp.float32)
    Z = build_channel_response(Xs, jnp.asarray(W2, jnp.float32))
    if mesh is not None and mesh.devices.size > 1:
        from channel_pruning_tpu.parallel.sharded import sharded_lasso_gram
        gram = sharded_lasso_gram(Z, Ys.reshape(-1), mesh)
    else:
        gram = lasso_gram(Z, Ys.reshape(-1))
    search = fused_search_alpha if fused else search_alpha
    return search(gram, rank, rank_tol, alpha0=alpha0,
                  grid_size=grid_size, max_rounds=max_rounds,
                  n_sweeps=n_sweeps, prefer=prefer)


def select_channels_fixed(X: np.ndarray, W2: np.ndarray, Y: np.ndarray,
                          alpha: float, *, subsample: int = 400,
                          seed: int = 0, n_sweeps: int = 200,
                          mesh=None) -> tuple[np.ndarray, float, int]:
    """Fixed-alpha, support-free selection (the reference's `autodet` /
    `norank` path, decompose.py:395,414-415,582-585): solve the LASSO ONCE
    at the given alpha and keep whatever support comes out — no band
    search, no target enforcement. Same (mask, alpha, support) contract as
    `select_channels`; the caller computes alpha = alpha0 / c**layeralpha."""
    N = X.shape[0]
    n_sub = min(subsample, max(N // 20, 1))
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, N, size=n_sub)
    Xs = jnp.asarray(X[rows], jnp.float32)
    Ys = jnp.asarray(Y[rows], jnp.float32)
    Z = build_channel_response(Xs, jnp.asarray(W2, jnp.float32))
    if mesh is not None and mesh.devices.size > 1:
        from channel_pruning_tpu.parallel.sharded import sharded_lasso_gram
        gram = sharded_lasso_gram(Z, Ys.reshape(-1), mesh)
    else:
        gram = lasso_gram(Z, Ys.reshape(-1))
    heartbeat()
    c = int(gram.G.shape[0])
    beta = cd_solve(gram.G, gram.b,
                    jnp.float32(alpha * gram.n_samples),
                    jnp.zeros(c, jnp.float32), n_sweeps=n_sweeps)
    mask = np.asarray(support_mask(beta[None, :])[0])
    return mask, float(alpha), int(mask.sum())


# ---------------------------------------------------------------------------
# group (multitask) LASSO — the reference's MultiTaskLasso branch for 1x1/FC
# consumers (lib/decompose.py:439-444,596-607): row-sparse B in
#   min 1/(2N) ||Y - X B||_F^2 + alpha * sum_c ||B_c||_2
# solved by block coordinate descent on the Gram system, vmapped over alphas.
# ---------------------------------------------------------------------------

class GroupGram(NamedTuple):
    G: jax.Array       # (c, c)  XᵀX
    C: jax.Array       # (c, n)  XᵀY
    n_samples: int


@jax.jit
@f32_matmuls
def group_gram(X: jax.Array, Y: jax.Array) -> GroupGram:
    G = X.T @ X
    return GroupGram(G=0.5 * (G + G.T), C=X.T @ Y, n_samples=X.shape[0])


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
@f32_matmuls
def group_cd_solve(G: jax.Array, C: jax.Array, alpha_n: jax.Array,
                   n_sweeps: int = 200, tol: float = 1e-8) -> jax.Array:
    """Block CD: row j update  B_j = soft_group(R_j) / G_jj  with
    R_j = C_j - (G B)_j + G_jj B_j and group soft-threshold
    soft_group(r) = max(0, 1 - alpha_n/||r||) r."""
    c, n = C.shape
    diag = jnp.diagonal(G)
    safe_diag = jnp.where(diag > 0, diag, 1.0)

    def row(j, carry):
        B, Q, max_delta = carry                     # Q = G @ B
        Rj = C[j] - Q[j] + diag[j] * B[j]           # (n,)
        norm = jnp.sqrt(jnp.sum(Rj * Rj) + 1e-30)
        scale = jnp.maximum(0.0, 1.0 - alpha_n / norm) / safe_diag[j]
        Bj = jnp.where(diag[j] > 0, scale * Rj, 0.0)
        delta = Bj - B[j]
        Q = Q + jnp.outer(G[:, j], delta)
        B = B.at[j].set(Bj)
        return B, Q, jnp.maximum(max_delta, jnp.max(jnp.abs(delta)))

    def sweep(state):
        B, Q, _, it = state
        B, Q, max_delta = jax.lax.fori_loop(0, c, row, (B, Q, 0.0))
        return B, Q, max_delta, it + 1

    def cont(state):
        B, _, max_delta, it = state
        scale = jnp.maximum(jnp.max(jnp.abs(B)), 1e-12)
        return jnp.logical_and(it < n_sweeps,
                               jnp.logical_or(it == 0, max_delta > tol * scale))

    B0 = jnp.zeros((c, n), G.dtype)
    B, _, _, _ = jax.lax.while_loop(cont, sweep,
                                    (B0, jnp.zeros((c, n), G.dtype),
                                     jnp.float32(jnp.inf), 0))
    return B


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
@f32_matmuls
def group_cd_solve_grid(G: jax.Array, C: jax.Array, alphas_n: jax.Array,
                        n_sweeps: int = 200) -> jax.Array:
    return jax.vmap(lambda a: group_cd_solve(G, C, a, n_sweeps))(alphas_n)


def group_row_norms(Bs: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(Bs * Bs, axis=-1))


def search_alpha_group(gram: GroupGram, rank: int, rank_tol: float,
                       alpha0: float = 1e-3, grid_size: int = 16,
                       max_rounds: int = 8, n_sweeps: int = 200,
                       prefer: str = "top") -> tuple[np.ndarray, float, int]:
    """Group-lasso variant of `search_alpha`: same support-band termination
    (decompose.py:487-525), supports counted on row norms; `prefer` picks
    the band end as in `search_alpha`."""
    c = int(gram.G.shape[0])
    if rank >= c:
        return np.ones(c, bool), 0.0, c
    lbound = rank
    rbound = rank + (rank_tol if rank_tol >= 1 else rank_tol * rank)
    N = gram.n_samples
    top = prefer == "top"
    alphas = alpha0 * (2.0 ** np.arange(-2, grid_size - 2, dtype=np.float64))
    lo, hi = 0.0, None
    norms = None
    best_cand = None  # (support, mask, alpha) — best at the preferred end
    best_over = None  # (support, row norms, alpha) for the exact-count trim
    refines = 0       # each refinement is a full grid solve — bound them
    for _ in range(max_rounds):
        heartbeat()   # each grid solve can take seconds-to-minutes cold
        a = jnp.asarray(alphas * N, dtype=gram.G.dtype)
        Bs = group_cd_solve_grid(gram.G, gram.C, a, n_sweeps=n_sweeps)
        norms = np.asarray(group_row_norms(Bs))            # (A, c)
        scale = np.maximum(norms.max(axis=1, keepdims=True), 1e-30)
        masks = norms > 1e-6 * scale
        supports = masks.sum(axis=1)
        if not top:
            ge = np.where(supports >= lbound)[0]
            if ge.size:
                gi = ge[supports[ge].argmin()]
                if best_over is None or supports[gi] < best_over[0]:
                    best_over = (int(supports[gi]), norms[gi],
                                 float(alphas[gi]))
        in_band = np.where((supports >= lbound) & (supports <= rbound))[0]
        if in_band.size:
            pick = np.argmax if top else np.argmin
            bi = in_band[pick(supports[in_band])]
            better = (best_cand is None or
                      (supports[bi] > best_cand[0] if top
                       else supports[bi] < best_cand[0]))
            if better:
                best_cand = (int(supports[bi]), masks[bi], float(alphas[bi]))
            if (best_cand[0] >= int(rbound)) if top else \
                    (best_cand[0] <= lbound):
                break
            refines += 1
            if refines > 2:
                break
            if top:
                over_i = np.where(supports > rbound)[0]
                a_hi = best_cand[2]
                a_lo = float(alphas[over_i[supports[over_i].argmin()]]) \
                    if over_i.size else max(lo, a_hi / 2.0)
            else:
                under_i = np.where(supports < lbound)[0]
                a_lo = best_cand[2]
                a_hi = float(alphas[under_i[supports[under_i].argmax()]]) \
                    if under_i.size else (hi if hi is not None else a_lo * 2.0)
            if a_hi - a_lo <= 1e-12 * max(a_hi, 1e-30):
                break
            alphas = np.linspace(a_lo, a_hi, grid_size + 2,
                                 dtype=np.float64)[1:-1]
            continue
        over = np.where(supports > rbound)[0]
        under = np.where(supports < lbound)[0]
        if over.size:
            lo = float(alphas[over[supports[over].argmin()]])
        if under.size:
            hi = float(alphas[under[supports[under].argmax()]])
        if hi is None:
            alphas = alphas * (2.0 ** grid_size)
            continue
        if not over.size:
            lo = hi / (2.0 ** grid_size)
        alphas = np.linspace(lo, hi, grid_size + 2, dtype=np.float64)[1:-1]
    if not top and (best_cand is None or best_cand[0] != lbound):
        # exact-count trim / top-up by row-norm order (see search_alpha)
        if best_over is not None:
            rn, alpha = best_over[1], best_over[2]
            mask = np.zeros(c, bool)
            mask[np.argsort(-rn)[:rank]] = True
            return mask, alpha, int(mask.sum())
        dist = np.abs(supports - lbound)
        bi = int(np.argmin(dist))
        mask = np.asarray(masks[bi]).copy()
        short = rank - int(mask.sum())
        if short > 0:
            energy = np.where(mask, -np.inf,
                              np.asarray(jnp.diagonal(gram.G), np.float64))
            mask[np.argsort(-energy)[:short]] = True
        return mask, float(alphas[bi]), int(mask.sum())
    if best_cand is not None:
        return best_cand[1], best_cand[2], best_cand[0]
    dist = np.minimum(np.abs(supports - lbound), np.abs(supports - rbound))
    best = int(np.argmin(dist))
    return masks[best], float(alphas[best]), int(supports[best])


def select_channels_group(X: np.ndarray, Y: np.ndarray, rank: int, *,
                          alpha0: float = 1e-3, rank_tol: float = 0.1,
                          subsample: int = 400, seed: int = 0,
                          grid_size: int = 16, max_rounds: int = 8,
                          n_sweeps: int = 200, mesh=None, prefer: str = "top",
                          ) -> tuple[np.ndarray, float, int]:
    """Group-lasso channel selection for 1x1/FC consumers: X (N, c[,1,1]),
    Y (N, n). Row subsampling as in decompose.py:425."""
    X = np.asarray(X, np.float32).reshape(X.shape[0], -1)
    N = X.shape[0]
    n_sub = min(subsample, max(N // 20, 1))
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, N, size=n_sub)
    if mesh is not None and mesh.devices.size > 1:
        from channel_pruning_tpu.parallel.sharded import sharded_group_gram
        gram = sharded_group_gram(jnp.asarray(X[rows]),
                                  jnp.asarray(Y[rows], jnp.float32), mesh)
    else:
        gram = group_gram(jnp.asarray(X[rows]),
                          jnp.asarray(Y[rows], jnp.float32))
    return search_alpha_group(gram, rank, rank_tol, alpha0=alpha0,
                              grid_size=grid_size, max_rounds=max_rounds,
                              n_sweeps=n_sweeps, prefer=prefer)
