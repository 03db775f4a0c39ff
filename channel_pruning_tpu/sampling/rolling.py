"""Rolling activation replay for strictly sequential solve passes.

The per-layer extraction in pipeline/c3.py replays the running graph from the
input for every consumer — O(L^2) conv work over the whole pass (the
reference does the same: 500 forwards per extraction, 3x per layer,
lib/net.py:1330,1386,1698). For CHAIN graphs (VGG / plain nets) the pass is
strictly sequential, so we can instead keep the *current consumer's bottom
activations for the entire calibration set resident in HBM* and advance them
layer-by-layer with the already-updated weights — O(L) total conv work.

Memory discipline: the frontier is stored as a LIST of per-group arrays
(default 100 images/group). Advancing replaces one group at a time, so the
peak is (full frontier) + (one group's output) ≈ 6.4 GB + 1.3 GB for VGG-16
at 500 images — advancing a monolithic 6.4 GB tensor would need both the old
and new frontier live (~13 GB) and OOM a v5e chip. Gathers are jitted per
group with clamp+mask padding (ops/patches.py) so no padded copy of the
frontier is ever materialised.

`fits_in_hbm`-style guards live in pipeline/c3._maybe_rolling; callers fall
back to full replays (sampling.sample_patches) for residual topologies or
oversized calibration sets.

Mesh sharding (SURVEY.md §5 — the sample dimension is this framework's
scaling axis): with `mesh=`, every frontier group's image axis is sharded
over the mesh, so the segment advances (the dominant conv work of the solve
phase) run data-parallel across chips; groups are padded with whole zero
batches to a device-count multiple and the gathers slice the real batches
back out, so sampled rows — and therefore channel selections — are identical
to the single-device pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.graph.ir import Graph, LT, shapes_of
from channel_pruning_tpu.ops.forward import compute_layer
from channel_pruning_tpu.ops.patches import (gather_channels_at_points,
                                             gather_patches_at_points)

_STRUCT = (LT.ELTWISE, LT.CONCAT, LT.SELECT)


def _pad_batches_for(mesh, step: int, bs: int) -> int:
    """Smallest number of whole zero batches to append per group so the
    group's image count divides the mesh (NamedSharding needs an even
    split). Always < mesh_size / gcd(bs, mesh_size)."""
    if mesh is None or mesh.devices.size <= 1:
        return 0
    D = int(mesh.devices.size)
    g = np.gcd(bs, D)
    return int((-step) % (D // g))


def _shard_group(a: jax.Array, mesh) -> jax.Array:
    if mesh is None or mesh.devices.size <= 1:
        return jnp.asarray(a)
    from channel_pruning_tpu.parallel import mesh as mesh_mod

    return jax.device_put(a, mesh_mod.batch_sharded(mesh))


def _make_groups(inputs, step: int, bs: int, mesh) -> list[jax.Array]:
    """Split the (n_batches, bs, C, H, W) calibration source into uniform
    groups of `step` batches, zero-padded to a mesh-divisible image count
    and device_put with the batch sharding. A SyntheticInputs source is
    generated straight into HBM — the frontier's backing set never crosses
    the tunnel."""
    from channel_pruning_tpu.sampling.inputs import device_chunk

    pad_b = _pad_batches_for(mesh, step, bs)
    groups = []
    for lo in range(0, inputs.shape[0], step):
        g = device_chunk(inputs, lo, lo + step)
        if pad_b:
            g = jnp.concatenate(
                [g, jnp.zeros((pad_b * bs,) + g.shape[1:], g.dtype)], axis=0)
        groups.append(_shard_group(g, mesh))
    return groups


@functools.lru_cache(maxsize=256)
def _patch_gather_fn(bs: int, real_b: int, kern):
    """Jitted per-group patch gather, cached so repeated layers don't
    re-trace: a (padded_imgs, C, H, W) group -> (real_b*bs*points, C, kh, kw)
    rows (padded batches sliced away before the gather)."""
    (kh, kw), (sh, sw), (ph, pw) = kern

    @jax.jit
    def gather(a, yy, xx):
        ag = a.reshape((-1, bs) + a.shape[1:])[:real_b]
        out = jax.vmap(lambda v, y, x: gather_patches_at_points(
            v, y, x, (kh, kw), (sh, sw), (ph, pw)))(ag, yy, xx)
        return out.reshape((-1,) + out.shape[2:])

    return gather


@functools.lru_cache(maxsize=256)
def _channel_gather_fn(bs: int, real_b: int):
    @jax.jit
    def gather(v, yy, xx):
        vg = v.reshape((-1, bs) + v.shape[1:])[:real_b]
        rows = jax.vmap(gather_channels_at_points)(vg, yy, xx)
        return rows.reshape(-1, rows.shape[-1])

    return gather


class FrontierError(RuntimeError):
    """The frontier cannot serve this request (non-monotone advance, or the
    requested tensor is not at/behind the cut). Callers fall back to a full
    replay — any OTHER exception from the rolling path is a real bug and
    must propagate."""


def is_chain(graph: Graph) -> bool:
    """True when every activation tensor has exactly one consumer path —
    no residual junctions (Eltwise/Concat) between convs."""
    return not graph.by_type(*_STRUCT)


def estimate_peak_bytes(graph: Graph, n_images: int, dtype_bytes: int = 4) -> int:
    shapes = shapes_of(graph, batch=1)
    return max((int(np.prod(s[1:])) for s in shapes.values() if len(s) == 4),
               default=0) * n_images * dtype_bytes


@functools.lru_cache(maxsize=64)
def _segment_fn(graph: Graph, from_tensor: str, to_tensor: str,
                compute_dtype: str | None, mesh=None):
    """Jitted fn(params, acts_at_from) -> acts_at_to, applying the layer
    slice (from_tensor, to_tensor]. NHWC internally like ops/forward. With
    `mesh`, the image axis stays sharded through the segment (the conv work
    is per-image, so XLA partitions it with zero collectives)."""
    from channel_pruning_tpu.sampling.sampler import _dtype_of

    start = graph.index(graph.producer(from_tensor).name) if \
        graph.producer(from_tensor) is not None else -1
    cd = _dtype_of(compute_dtype)
    constraint = None
    if mesh is not None and mesh.devices.size > 1:
        from channel_pruning_tpu.parallel import mesh as mesh_mod

        constraint = mesh_mod.batch_sharded(mesh)

    @jax.jit
    def fn(params, x):  # x: (N, C, H, W)
        env = {from_tensor: jnp.transpose(x, (0, 2, 3, 1))}
        for l in graph.layers[start + 1:]:
            if not all(b in env for b in l.bottoms):
                continue
            compute_layer(l, env, params, compute_dtype=cd)
            if to_tensor in env:
                break
        out = jnp.transpose(env[to_tensor], (0, 3, 1, 2))
        if constraint is not None:
            out = jax.lax.with_sharding_constraint(out, constraint)
        return out

    return fn


class RollingReplay:
    """HBM-resident activation frontier over the calibration set, stored as
    per-group chunks."""

    def __init__(self, graph: Graph, inputs: np.ndarray,
                 compute_dtype: str | None = None, group_batches: int = 10,
                 mesh=None):
        self.graph = graph
        self.batch_size = inputs.shape[1]
        n_batches = inputs.shape[0]
        step = min(group_batches, n_batches)
        while n_batches % step:
            step -= 1  # uniform groups -> one compile serves all
        self.group_batches = step
        self.n_images = n_batches * self.batch_size
        self.mesh = mesh
        self.groups: list[jax.Array] = _make_groups(
            inputs, step, self.batch_size, mesh)
        self.tensor = graph.inputs[0].name
        self.compute_dtype = compute_dtype

    def advance_to(self, params, tensor: str) -> None:
        """Move the frontier forward to `tensor` using CURRENT params,
        one group at a time (bounded memory)."""
        if tensor == self.tensor:
            return
        cur = self.graph.producer(self.tensor)
        prod = self.graph.producer(tensor)
        if prod is None or (cur is not None and
                            self.graph.index(prod.name) <=
                            self.graph.index(cur.name)):
            raise FrontierError(f"cannot rewind frontier to {tensor}")
        fn = _segment_fn(self.graph, self.tensor, tensor, self.compute_dtype,
                         self.mesh)
        for i in range(len(self.groups)):
            self.groups[i] = fn(params, self.groups[i])
        self.tensor = tensor

    def patches_at(self, plan, conv: str) -> np.ndarray:
        """(N, c, kh, kw) input patches of `conv` gathered from the frontier
        (which must be at conv's bottom)."""
        l = self.graph.layer(conv)
        if l.bottoms[0] != self.tensor:
            raise FrontierError(
                f"frontier at {self.tensor}, need {l.bottoms[0]}")
        geo = l.conv_geometry()
        ys_all, xs_all = plan[l.tops[0]]
        kern = ((geo["kh"], geo["kw"]), (geo["sh"], geo["sw"]),
                (geo["ph"], geo["pw"]))
        gather = _patch_gather_fn(self.batch_size, self.group_batches, kern)

        outs = []
        for gi, g in enumerate(self.groups):
            lo = gi * self.group_batches
            hi = lo + self.group_batches
            outs.append(gather(g, jnp.asarray(ys_all[lo:hi]),
                               jnp.asarray(xs_all[lo:hi])))
        # stays device-resident: the solvers consume it on device, and a
        # 92 MB host round-trip per layer costs ~2 s over the tunnel
        return jnp.concatenate(outs, axis=0)

    def features_at(self, params, plan, tensor: str,
                    device: bool = False) -> np.ndarray:
        """Sampled responses of `tensor` computed from the frontier (one
        layer-segment forward per group, frontier unchanged). With
        `device=True` the result stays HBM-resident and NOTHING syncs the
        host — the async pipelined solve's residual-compensation path."""
        fn = _segment_fn(self.graph, self.tensor, tensor, self.compute_dtype,
                         self.mesh)
        ys_all, xs_all = plan[tensor]
        gather = _channel_gather_fn(self.batch_size, self.group_batches)

        outs = []
        for gi, g in enumerate(self.groups):
            lo = gi * self.group_batches
            hi = lo + self.group_batches
            v = fn(params, g)
            outs.append(gather(v, jnp.asarray(ys_all[lo:hi]),
                               jnp.asarray(xs_all[lo:hi])))
        if device:
            return jnp.concatenate(outs, axis=0)
        return np.concatenate([np.asarray(o) for o in outs], axis=0)


# ---------------------------------------------------------------------------
# DAG generalisation: rolling cut for residual topologies
# ---------------------------------------------------------------------------

def _last_use(graph: Graph) -> dict[str, int]:
    """tensor -> index of its last consumer layer (-1 if never consumed)."""
    last: dict[str, int] = {}
    for i, l in enumerate(graph.layers):
        for b in l.bottoms:
            last[b] = i
    return last


def estimate_cut_bytes(graph: Graph, n_images: int, dtype_bytes: int = 4) -> int:
    """Peak total size of the live-tensor cut while sweeping the graph in
    order — the DAG rolling frontier's memory footprint."""
    shapes = shapes_of(graph, batch=1)
    last = _last_use(graph)
    live: dict[str, int] = {}
    for spec in graph.inputs:
        if len(spec.shape) == 4:
            live[spec.name] = int(np.prod(spec.shape[1:])) * dtype_bytes
    peak = sum(live.values())
    for i, l in enumerate(graph.layers):
        for t in l.tops:
            s = shapes.get(t)
            if s is not None and len(s) == 4:
                live[t] = int(np.prod(s[1:])) * dtype_bytes
        for t in list(live):
            if last.get(t, -1) <= i:
                live.pop(t)
        peak = max(peak, sum(live.values()))
    return peak * n_images


class RollingReplayDAG:
    """Rolling frontier for general (residual) graphs: the state is the CUT
    of tensors still needed by later layers (for ResNet: the block input
    riding the shortcut plus the current branch tensor). Same O(L) total
    conv work as the chain version; same API (advance_to / patches_at /
    features_at)."""

    def __init__(self, graph: Graph, inputs: np.ndarray,
                 compute_dtype: str | None = None, group_batches: int = 10,
                 mesh=None):
        from channel_pruning_tpu.sampling.sampler import _dtype_of

        self.graph = graph
        self.batch_size = inputs.shape[1]
        n_batches = inputs.shape[0]
        step = min(group_batches, n_batches)
        while n_batches % step:
            step -= 1
        self.group_batches = step
        self.n_groups = n_batches // step
        self.n_images = n_batches * self.batch_size
        self.mesh = mesh
        in_name = graph.inputs[0].name
        # state: {tensor: [group arrays]}
        self.state: dict[str, list[jax.Array]] = {
            in_name: _make_groups(inputs, step, self.batch_size, mesh)}
        self.pos = -1                      # index of last executed layer
        self.last = _last_use(graph)
        self.cd = _dtype_of(compute_dtype)
        self._seg_cache: dict = {}
        self._constraint = None
        if mesh is not None and mesh.devices.size > 1:
            from channel_pruning_tpu.parallel import mesh as mesh_mod

            self._constraint = mesh_mod.batch_sharded(mesh)

    def _segment(self, target_idx: int):
        """Jitted fn(params, state_dict) -> new state_dict executing layers
        (pos, target_idx]."""
        key = (self.pos, target_idx, tuple(sorted(self.state)))
        fn = self._seg_cache.get(key)
        if fn is not None:
            return fn
        graph, pos, last, cd = self.graph, self.pos, self.last, self.cd
        keep_after = target_idx
        constraint = self._constraint

        @jax.jit
        def fn(params, state):
            env = {t: jnp.transpose(v, (0, 2, 3, 1)) for t, v in state.items()}
            for l in graph.layers[pos + 1:target_idx + 1]:
                if not all(b in env for b in l.bottoms):
                    continue
                compute_layer(l, env, params, compute_dtype=cd)
            out = {}
            for t, v in env.items():
                if last.get(t, -1) > keep_after or \
                        t in graph.layers[target_idx].tops:
                    o = jnp.transpose(v, (0, 3, 1, 2))
                    if constraint is not None:
                        o = jax.lax.with_sharding_constraint(o, constraint)
                    out[t] = o
            return out

        self._seg_cache[key] = fn
        return fn

    def advance_to(self, params, tensor: str) -> None:
        """Execute layers forward until `tensor` is produced; keep the live
        cut."""
        if tensor in self.state:
            return
        prod = self.graph.producer(tensor)
        target_idx = self.graph.index(prod.name)
        if target_idx <= self.pos:
            raise FrontierError(f"cannot rewind frontier to {tensor}")
        fn = self._segment(target_idx)
        new_state: dict[str, list[jax.Array]] = {}
        for gi in range(self.n_groups):
            res = fn(params, {t: v[gi] for t, v in self.state.items()})
            for t, a in res.items():
                new_state.setdefault(t, []).append(a)
        self.state = new_state
        self.pos = target_idx

    def patches_at(self, plan, conv: str) -> np.ndarray:
        l = self.graph.layer(conv)
        bottom = l.bottoms[0]
        if bottom not in self.state:
            raise FrontierError(
                f"{bottom} not in the live cut {sorted(self.state)}")
        geo = l.conv_geometry()
        ys_all, xs_all = plan[l.tops[0]]
        kern = ((geo["kh"], geo["kw"]), (geo["sh"], geo["sw"]),
                (geo["ph"], geo["pw"]))
        gather = _patch_gather_fn(self.batch_size, self.group_batches, kern)

        outs = []
        for gi, g in enumerate(self.state[bottom]):
            lo = gi * self.group_batches
            hi = lo + self.group_batches
            outs.append(gather(g, jnp.asarray(ys_all[lo:hi]),
                               jnp.asarray(xs_all[lo:hi])))
        return jnp.concatenate(outs, axis=0)   # device-resident (see chain)

    def features_at(self, params, plan, tensor: str,
                    device: bool = False) -> np.ndarray:
        """Sampled responses of `tensor`: directly from the cut when alive,
        otherwise computed forward from the cut (state unchanged). With
        `device=True` the result stays HBM-resident (see RollingReplay)."""
        ys_all, xs_all = plan[tensor]
        gather = _channel_gather_fn(self.batch_size, self.group_batches)

        if tensor in self.state:
            groups = self.state[tensor]
        else:
            prod = self.graph.producer(tensor)
            target_idx = self.graph.index(prod.name)
            key = ("feat", self.pos, target_idx, tuple(sorted(self.state)))
            seg = self._seg_cache.get(key)
            if seg is None:
                graph, pos, cd = self.graph, self.pos, self.cd

                @jax.jit
                def seg(params, state):
                    env = {t: jnp.transpose(v, (0, 2, 3, 1))
                           for t, v in state.items()}
                    for l in graph.layers[pos + 1:target_idx + 1]:
                        if not all(b in env for b in l.bottoms):
                            continue
                        compute_layer(l, env, params, compute_dtype=cd)
                    return jnp.transpose(env[tensor], (0, 3, 1, 2))

                self._seg_cache[key] = seg
            groups = [seg(params, {t: v[gi] for t, v in self.state.items()})
                      for gi in range(self.n_groups)]
        outs = []
        for gi, g in enumerate(groups):
            lo = gi * self.group_batches
            hi = lo + self.group_batches
            outs.append(gather(g, jnp.asarray(ys_all[lo:hi]),
                               jnp.asarray(xs_all[lo:hi])))
        if device:
            return jnp.concatenate(outs, axis=0)
        return np.concatenate([np.asarray(o) for o in outs], axis=0)
