"""Pallas TPU kernel: Gram-based LASSO coordinate descent over an alpha grid.

The framework's hottest solver (ops/lasso.py, replacing sklearn CD inside the
reference's alpha bisection, lib/decompose.py:449,487-525). The XLA version
runs each coordinate update as separate fused ops with the Gram matrix
re-fetched from HBM; this kernel pins G (c x c), b, and the running (beta, q)
state in VMEM for the entire solve. Each grid program solves EIGHT alphas at
once, vectorised across VPU sublanes — the whole support-size search happens
in one kernel launch.

Per-coordinate update (covariance form), vectorised over the 8-alpha block:
    c_j   = b_j - q_j + G_jj * beta_j        q = G @ beta (maintained)
    beta' = soft(c_j, alpha*N) / G_jj
    q    += G[j, :] * (beta' - beta_j)       (G symmetric: row == column)

Scalar extraction at a dynamic lane index uses a one-hot reduction (TPU
vectors can't be scalar-indexed on the lane dim); the G[j, :] row read uses
dynamic sublane indexing, which Mosaic supports natively.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; import guarded for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

ALPHA_BLOCK = 8  # alphas per grid program (one per VPU sublane)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cd_kernel(alpha_ref, G_ref, b_ref, diag_ref, out_ref, *, c_pad: int,
               n_sweeps: int, tol: float):
    alpha_n = alpha_ref[:, 0:1]                      # (8, 1)
    b = b_ref[0:1, :]                                # (1, c)
    diag = diag_ref[0:1, :]
    safe_diag = jnp.where(diag > 0, diag, 1.0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

    def coord(j, carry):
        beta, q, max_delta = carry
        onehot = (col_ids == j).astype(jnp.float32)              # (1, c)
        cvec = b - q + diag * beta                               # (8, c)
        cj = jnp.sum(cvec * onehot, axis=1, keepdims=True)       # (8, 1)
        dj = jnp.sum(safe_diag * onehot)
        active = jnp.sum(diag * onehot) > 0
        bj = jnp.sign(cj) * jnp.maximum(jnp.abs(cj) - alpha_n, 0.0) / dj
        bj = jnp.where(active, bj, 0.0)
        delta = bj - jnp.sum(beta * onehot, axis=1, keepdims=True)
        row = G_ref[j, :].reshape(1, c_pad)          # dynamic sublane row read
        q = q + row * delta
        beta = beta + delta * onehot
        return beta, q, jnp.maximum(max_delta, jnp.max(jnp.abs(delta)))

    def sweep(state):
        beta, q, _, it = state
        beta, q, max_delta = jax.lax.fori_loop(0, c_pad, coord,
                                               (beta, q, 0.0))
        return beta, q, max_delta, it + 1

    def cont(state):
        beta, _, max_delta, it = state
        scale = jnp.maximum(jnp.max(jnp.abs(beta)), 1e-12)
        return jnp.logical_and(
            it < n_sweeps,
            jnp.logical_or(it == 0, max_delta > tol * scale))

    beta0 = jnp.zeros((ALPHA_BLOCK, c_pad), jnp.float32)
    q0 = jnp.zeros((ALPHA_BLOCK, c_pad), jnp.float32)
    beta, _, _, _ = jax.lax.while_loop(cont, sweep,
                                       (beta0, q0, jnp.float32(jnp.inf), 0))
    out_ref[:, :] = beta


@functools.partial(jax.jit, static_argnames=("n_sweeps", "tol", "interpret"))
def cd_solve_grid_pallas(G: jax.Array, b: jax.Array, alphas_n: jax.Array,
                         n_sweeps: int = 200, tol: float = 1e-8,
                         interpret: bool = False) -> jax.Array:
    """Solve the alpha grid: (A, c) betas. G (c, c) symmetric PSD, b (c,),
    alphas_n (A,) thresholds in Gram units (alpha * n_samples)."""
    c = G.shape[0]
    c_pad = max(_round_up(c, 128), 128)
    A = alphas_n.shape[0]
    A_pad = _round_up(A, ALPHA_BLOCK)
    Gp = jnp.zeros((c_pad, c_pad), jnp.float32).at[:c, :c].set(
        G.astype(jnp.float32))
    bp = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(b.astype(jnp.float32))
    diag = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(
        jnp.diagonal(G).astype(jnp.float32))
    # alpha table broadcast along lanes so it lives in VMEM tiles
    al = jnp.zeros((A_pad,), jnp.float32).at[:A].set(
        alphas_n.astype(jnp.float32))
    al = jnp.broadcast_to(al[:, None], (A_pad, 128))

    kernel = functools.partial(_cd_kernel, c_pad=c_pad, n_sweeps=n_sweeps,
                               tol=tol)
    out = pl.pallas_call(
        kernel,
        grid=(A_pad // ALPHA_BLOCK,),
        in_specs=[
            pl.BlockSpec((ALPHA_BLOCK, 128), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, c_pad), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ALPHA_BLOCK, c_pad), lambda a: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(al, Gp, bp, diag)
    return out[:A, :c]


def pallas_available() -> bool:
    return _HAS_PALLAS and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# HBM-streaming variant for large c: G stays in HBM; coordinate rows are
# DMA'd into a double-buffered VMEM scratch (the VMEM-resident kernel above
# caps at c=1024 — G alone is 16 MB at c=2048). Per-coordinate traffic is one
# (1, c) row (8 KB at c=2048), overlapped with the update math.
# ---------------------------------------------------------------------------

def _cd_kernel_hbm(alpha_ref, G_hbm, b_ref, diag_ref, out_ref,
                   row_scratch, sems, *, c_pad: int, n_sweeps: int,
                   tol: float):
    """G rows stream in 8-row blocks (sublane-tiling-aligned DMAs) into a
    double-buffered (2, 8, c) scratch; within a block, single rows are
    extracted with a one-hot sublane reduction (dynamic size-1 sublane
    slices are not Mosaic-tileable)."""
    alpha_n = alpha_ref[:, 0:1]                      # (8, 1)
    b = b_ref[0:1, :]
    diag = diag_ref[0:1, :]
    safe_diag = jnp.where(diag > 0, diag, 1.0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    n_blocks = c_pad // 8

    def block_dma(slot, blk):
        return pltpu.make_async_copy(G_hbm.at[pl.ds(blk * 8, 8), :],
                                     row_scratch.at[slot],
                                     sems.at[slot])

    def block(blk, carry):
        beta, q, max_delta = carry
        slot = jax.lax.rem(blk, 2)
        block_dma(slot, blk).wait()
        nxt = jax.lax.rem(blk + 1, n_blocks)
        block_dma(jax.lax.rem(blk + 1, 2), nxt).start()
        rows8 = row_scratch[slot]                    # (8, c_pad)

        def coord(k, inner):
            beta, q, max_delta = inner
            j = blk * 8 + k
            onehot = (col_ids == j).astype(jnp.float32)
            cvec = b - q + diag * beta
            cj = jnp.sum(cvec * onehot, axis=1, keepdims=True)
            dj = jnp.sum(safe_diag * onehot)
            active = jnp.sum(diag * onehot) > 0
            bj = jnp.sign(cj) * jnp.maximum(jnp.abs(cj) - alpha_n, 0.0) / dj
            bj = jnp.where(active, bj, 0.0)
            delta = bj - jnp.sum(beta * onehot, axis=1, keepdims=True)
            rowhot = (sub_ids == k).astype(jnp.float32)      # (8, 1)
            row = jnp.sum(rows8 * rowhot, axis=0, keepdims=True)
            q = q + row * delta
            beta = beta + delta * onehot
            return beta, q, jnp.maximum(max_delta, jnp.max(jnp.abs(delta)))

        return jax.lax.fori_loop(0, 8, coord, (beta, q, max_delta))

    def sweep(state):
        beta, q, _, it = state
        beta, q, max_delta = jax.lax.fori_loop(0, n_blocks, block,
                                               (beta, q, 0.0))
        return beta, q, max_delta, it + 1

    def cont(state):
        beta, _, max_delta, it = state
        scale = jnp.maximum(jnp.max(jnp.abs(beta)), 1e-12)
        return jnp.logical_and(
            it < n_sweeps,
            jnp.logical_or(it == 0, max_delta > tol * scale))

    block_dma(0, 0).start()                          # warm up the pipeline
    beta0 = jnp.zeros((ALPHA_BLOCK, c_pad), jnp.float32)
    q0 = jnp.zeros((ALPHA_BLOCK, c_pad), jnp.float32)
    beta, _, _, _ = jax.lax.while_loop(cont, sweep,
                                       (beta0, q0, jnp.float32(jnp.inf), 0))
    # one in-flight DMA remains (started by the last block): drain it
    block_dma(0, 0).wait()
    out_ref[:, :] = beta


@functools.partial(jax.jit, static_argnames=("n_sweeps", "tol", "interpret"))
def cd_solve_grid_pallas_hbm(G: jax.Array, b: jax.Array, alphas_n: jax.Array,
                             n_sweeps: int = 200, tol: float = 1e-8,
                             interpret: bool = False) -> jax.Array:
    """Large-c alpha-grid CD: same contract as cd_solve_grid_pallas with G
    streamed from HBM row-by-row."""
    c = G.shape[0]
    c_pad = max(_round_up(c, 128), 128)
    A = alphas_n.shape[0]
    A_pad = _round_up(A, ALPHA_BLOCK)
    Gp = jnp.zeros((c_pad, c_pad), jnp.float32).at[:c, :c].set(
        G.astype(jnp.float32))
    bp = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(b.astype(jnp.float32))
    diag = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(
        jnp.diagonal(G).astype(jnp.float32))
    al = jnp.zeros((A_pad,), jnp.float32).at[:A].set(
        alphas_n.astype(jnp.float32))
    al = jnp.broadcast_to(al[:, None], (A_pad, 128))

    kernel = functools.partial(_cd_kernel_hbm, c_pad=c_pad,
                               n_sweeps=n_sweeps, tol=tol)
    out = pl.pallas_call(
        kernel,
        grid=(A_pad // ALPHA_BLOCK,),
        in_specs=[
            pl.BlockSpec((ALPHA_BLOCK, 128), lambda a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # G stays off-chip
            pl.BlockSpec((1, c_pad), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ALPHA_BLOCK, c_pad), lambda a: (a, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 8, c_pad), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(al, Gp, bp, diag)
    return out[:A, :c]
