"""Sharded solver reductions and data-parallel sampling.

The solver matrices have one big dimension — the sample rows N (50,000/layer
at reference defaults, lib/net.py:409-412). Everything downstream consumes
only Gram/cross products (ZᵀZ, Zᵀy, XᵀX, XᵀY), so the TPU plan is: shard
rows across the mesh, compute local partial products, all-reduce (psum over
ICI). XLA inserts the collective from the sharding annotations — no explicit
comm code (SURVEY.md §2.3 "Distributed comm backend").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from channel_pruning_tpu.ops.lasso import LassoGram
from channel_pruning_tpu.ops.lstsq import f32_matmuls
from channel_pruning_tpu.parallel import mesh as mesh_mod

P = jax.sharding.PartitionSpec


def _row_shard(x, mesh: jax.sharding.Mesh):
    """Place `x` row-sharded on the mesh. Device arrays whose leading dim
    divides the mesh reshard ON DEVICE (no host round-trip — the rolling
    frontier hands the solvers ~0.5 GB sharded patch matrices per layer);
    everything else pads on host first."""
    D = int(mesh.devices.size)
    if isinstance(x, jax.Array) and x.shape[0] % D == 0:
        return jax.device_put(x, mesh_mod.batch_sharded(mesh)), x.shape[0]
    xp, n = mesh_mod.pad_to_multiple(jax.device_get(jnp.asarray(x)), D)
    return jnp.asarray(xp), n


@functools.lru_cache(maxsize=8)
def _gram_fn(mesh: jax.sharding.Mesh):
    data = mesh_mod.batch_sharded(mesh)
    repl = mesh_mod.replicated(mesh)

    def f(Z, y):
        G = Z.T @ Z
        return 0.5 * (G + G.T), Z.T @ y

    return jax.jit(f, in_shardings=(data, data), out_shardings=(repl, repl))


@f32_matmuls
def sharded_lasso_gram(Z, y, mesh: jax.sharding.Mesh) -> LassoGram:
    """Row-sharded ZᵀZ / Zᵀy with an ICI all-reduce; result replicated so the
    (c x c) CD solve runs identically on every device."""
    n = Z.shape[0]
    Zp, _ = _row_shard(Z, mesh)
    yp, _ = _row_shard(y, mesh)
    G, b = _gram_fn(mesh)(Zp, yp)
    return LassoGram(G=G, b=b, n_samples=n)


@functools.lru_cache(maxsize=8)
def _group_gram_fn(mesh: jax.sharding.Mesh):
    data = mesh_mod.batch_sharded(mesh)
    repl = mesh_mod.replicated(mesh)

    def f(X, Y):
        G = X.T @ X
        return 0.5 * (G + G.T), X.T @ Y

    return jax.jit(f, in_shardings=(data, data), out_shardings=(repl, repl))


@f32_matmuls
def sharded_group_gram(X, Y, mesh: jax.sharding.Mesh):
    """Row-sharded XᵀX / XᵀY for the group-lasso (MultiTaskLasso) branch."""
    from channel_pruning_tpu.ops.lasso import GroupGram

    n = X.shape[0]
    Xp, _ = _row_shard(X, mesh)
    Yp, _ = _row_shard(Y, mesh)
    G, C = _group_gram_fn(mesh)(Xp, Yp)
    return GroupGram(G=G, C=C, n_samples=n)


@functools.lru_cache(maxsize=8)
def _moments_fn(mesh: jax.sharding.Mesh):
    data = mesh_mod.batch_sharded(mesh)
    repl = mesh_mod.replicated(mesh)

    def f(X, Y):
        # raw moments only: zero-padded rows contribute exactly nothing,
        # so padding to a device multiple is free of bias corrections
        return X.T @ X, X.T @ Y, X.sum(0), Y.sum(0)

    return jax.jit(f, in_shardings=(data, data),
                   out_shardings=(repl, repl, repl, repl))


@f32_matmuls
def sharded_lstsq(X, Y, mesh: jax.sharding.Mesh, ridge: float = 0.0,
                  jitter: float = 1e-6):
    """Centered normal-equation least squares with row-sharded reduction:
    W, b = argmin ||X Wᵀ + b − Y||² (ops/lstsq.py semantics, distributed)."""
    n = X.shape[0]
    Xp, _ = _row_shard(X, mesh)
    Yp, _ = _row_shard(Y, mesh)
    XtX, XtY, sx, sy = _moments_fn(mesh)(Xp, Yp)
    xm, ym = sx / n, sy / n
    Gc = XtX - n * jnp.outer(xm, xm)
    Cc = XtY - n * jnp.outer(xm, ym)
    Gc = 0.5 * (Gc + Gc.T)
    tr = jnp.maximum(jnp.trace(Gc), 1e-30)
    Gc = Gc + (ridge + jitter * tr) * jnp.eye(Gc.shape[0], dtype=Gc.dtype)
    chol = jax.scipy.linalg.cholesky(Gc, lower=True)
    W = jax.scipy.linalg.cho_solve((chol, True), Cc).T
    b = ym - W @ xm
    return W, b


def data_parallel_forward(graph, capture: tuple[str, ...],
                          mesh: jax.sharding.Mesh):
    """Batch-sharded whole-net inference for the sampling pass: one pjit
    forward per chunk, activations sharded on the batch dim, captures
    returned sharded (gathers happen only on the small sampled slabs)."""
    from channel_pruning_tpu.ops.forward import run_graph

    data = mesh_mod.batch_sharded(mesh)
    repl = mesh_mod.replicated(mesh)
    input_name = graph.inputs[0].name

    def f(params, x):
        _, caps = run_graph(graph, params, {input_name: x}, capture=capture)
        return caps

    return jax.jit(f, in_shardings=(repl, data), out_shardings=data)
