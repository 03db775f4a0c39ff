"""Activation sampling and the frozen calibration cache.

TPU-native redesign of the reference's sampling subsystem:

* `extract_features` (lib/net.py:368-532): 500 sequential pycaffe forwards,
  each sampling 10 random spatial points per conv top, becomes a *chunked
  jitted forward* that captures every requested tensor in one XLA program and
  gathers the sampled channel vectors on device — only (N, C) slabs ever
  reach the host.
* `extract_XY` (lib/net.py:534-684): the MemoryData replay + host im2col at
  sampled positions becomes `sample_patches`: replay the current graph under
  jit, gather (N, c, kh, kw) patches with `ops.patches`.
* `freeze_images` / `load_frozen` (lib/net.py:749-876): the pickled
  `[feats_dict, points_dict]` becomes `FrozenCache` (npz on disk): input
  batches + per-(batch, layer) point coordinates + ground-truth sampled
  responses. Replay is deterministic by construction (points are data, not
  RNG state).

Row-order contract (see ops/patches.py): within a batch of `bs` images with
`P` points, row = p * bs + b; batches are concatenated in order. X patches
and Y responses sampled with the same plan correspond row-for-row.

ResNet note: tensors that must share sample points (residual-branch tops —
reference forces identical randx/randy across them, lib/net.py:466-497) are
assigned the same `share_key` in the plan.
"""
from __future__ import annotations

import functools
import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from channel_pruning_tpu.graph.ir import Graph, LT, shapes_of
from channel_pruning_tpu.ops.forward import run_graph
from channel_pruning_tpu.ops.patches import (
    gather_channels_at_points, gather_patches_at_points)
from channel_pruning_tpu.sampling.inputs import SyntheticInputs, device_chunk
from channel_pruning_tpu.utils.runtime import (chunked_device_put,
                                               heartbeat as runtime_heartbeat)


# ---------------------------------------------------------------------------
# point plan
# ---------------------------------------------------------------------------

def make_point_plan(shapes: Mapping[str, tuple[int, ...]], tensors: Sequence[str],
                    n_batches: int, n_points: int, seed: int = 0,
                    share_key: Callable[[str], str] | None = None,
                    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Draw per-(batch, tensor) sample coordinates.

    Returns {tensor: (ys, xs)} with ys/xs int32 (n_batches, n_points).
    Tensors mapping to the same `share_key` get identical points (the
    residual-branch constraint, lib/net.py:466-497). Deterministic in `seed`
    (replaces the reference's saved randx/randy replay state).
    """
    rng = np.random.default_rng(seed)
    drawn: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    plan: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in tensors:
        shp = shapes[t]
        if len(shp) != 4:
            plan[t] = (np.zeros((n_batches, 0), np.int32),) * 2  # dense tensor
            continue
        key = share_key(t) if share_key else t
        if key not in drawn:
            h, w = shp[2], shp[3]
            drawn[key] = (rng.integers(0, h, (n_batches, n_points)).astype(np.int32),
                          rng.integers(0, w, (n_batches, n_points)).astype(np.int32))
        plan[t] = drawn[key]
    return plan


# ---------------------------------------------------------------------------
# chunked jitted gather-forward
# ---------------------------------------------------------------------------

def _dtype_of(name):
    return {None: None, "float32": None, "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16}[name]


# Set after a fused freeze program faults the TPU worker: later freezes in
# the same process go straight to the grouped path instead of re-crashing it.
_FUSE_DISABLED = False


@functools.lru_cache(maxsize=32)
def _feature_chunk_fn(graph: Graph, tensors: tuple[str, ...], batch_size: int,
                      compute_dtype: str | None = None, fuse: bool = False):
    """fn(params, x, ys, xs) -> {t: sampled rows}; x: (G*bs, C, H, W),
    ys/xs: {t: (G, P)}. Compiled once per (graph, tensors, bs).

    With `fuse=True` the per-tensor sampled rows are concatenated along the
    channel axis into one output per row-count group (spatial tensors all
    share rows = G*P*bs; dense ones share G*bs), so a whole-net freeze
    transfers 1-2 buffers instead of one per tensor — the axon tunnel's
    worker has been observed to fault on programs with many outputs."""
    input_name = graph.inputs[0].name
    graph = graph.ancestors_subgraph(tensors)   # skip layers past the captures
    cd = _dtype_of(compute_dtype)

    @jax.jit
    def fn(params, x, ys, xs):
        def make_tf(t):
            def tf(v):
                if v.ndim != 4 or ys[t].shape[1] == 0:
                    return v.reshape(v.shape[0], -1)   # dense (FC/1x1 tops)
                g = ys[t].shape[0]
                vg = v.reshape((g, batch_size) + v.shape[1:])
                rows = jax.vmap(gather_channels_at_points)(vg, ys[t], xs[t])
                return rows.reshape(-1, rows.shape[-1])
            return tf

        # gathers run at production time so full feature maps die immediately
        _, caps = run_graph(graph, params, {input_name: x},
                            capture_transforms={t: make_tf(t) for t in tensors},
                            compute_dtype=cd)
        if not fuse:
            return caps
        groups: dict[int, list] = {}
        for t in tensors:                       # deterministic: input order
            groups.setdefault(caps[t].shape[0], []).append(caps[t])
        return {rows: jnp.concatenate(vs, axis=1) if len(vs) > 1 else vs[0]
                for rows, vs in groups.items()}

    return fn


@functools.lru_cache(maxsize=64)
def _patch_chunk_fn(graph: Graph, bottom: str, batch_size: int,
                    kernel: tuple[int, int], stride: tuple[int, int],
                    pad: tuple[int, int], compute_dtype: str | None = None):
    input_name = graph.inputs[0].name
    graph = graph.ancestors_subgraph((bottom,))  # replay only up to `bottom`
    cd = _dtype_of(compute_dtype)

    @jax.jit
    def fn(params, x, ys, xs):
        def tf(v):
            g = ys.shape[0]
            vg = v.reshape((g, batch_size) + v.shape[1:])
            patches = jax.vmap(
                lambda a, yy, xx: gather_patches_at_points(a, yy, xx, kernel,
                                                           stride, pad)
            )(vg, ys, xs)
            return patches.reshape((-1,) + patches.shape[2:])

        _, caps = run_graph(graph, params, {input_name: x},
                            capture_transforms={bottom: tf},
                            compute_dtype=cd)
        return caps[bottom]

    return fn


def _chunk_iter(inputs: np.ndarray, chunk_batches: int):
    n_batches = inputs.shape[0]
    step = min(chunk_batches, n_batches)
    while n_batches % step:
        step -= 1  # keep chunk shapes uniform so one compile serves all chunks
    for i in range(0, n_batches, step):
        yield i, i + step


def _mesh_placer(mesh, chunk_g: int, bs: int):
    """Batch-shard the sampling chunk over a device mesh (SPMD freeze: convs
    are image-parallel, so XLA inserts no collectives — only the sampled-row
    outputs land sharded). Returns (place_x, place_plan) or (None, None)
    when the mesh is absent/size-1 or the chunk doesn't split evenly.

    Sharding the flat (G*bs, ...) image axis by whole point-plan groups
    requires G % n_devices == 0 (each shard then holds complete groups, so
    the row-order contract rows = g*P*bs + p*bs + b is preserved)."""
    if mesh is None or mesh.devices.size <= 1 or chunk_g % mesh.devices.size:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec

    ax = mesh.axis_names[0]
    row_sh = NamedSharding(mesh, PartitionSpec(ax))

    def place_x(arr):
        return jax.device_put(arr, row_sh)

    return place_x, place_x  # plan arrays (G, P) shard on the same axis


def _replicate_params(params, mesh):
    """Replicate the params pytree across the mesh (mixing committed
    single-device params with sharded activations would be an error)."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, rep), params)


def sample_features(graph: Graph, params, inputs: np.ndarray,
                    plan: Mapping[str, tuple[np.ndarray, np.ndarray]],
                    tensors: Sequence[str], chunk_batches: int = 25,
                    compute_dtype: str | None = None,
                    max_group: int = 6, fuse: bool = True,
                    mesh=None) -> dict[str, np.ndarray]:
    """Ground-truth response sampling: {tensor: (n_batches*P*bs, C)} (dense
    (n_images, D) for non-spatial tensors). inputs: (n_batches, bs, C, H, W).
    `compute_dtype="bfloat16"` runs conv math on the MXU in bf16 with f32
    accumulation (~2x throughput; replay-only — freeze ground truth should
    stay f32).

    Default path (`fuse=True`): ONE jitted program captures every tensor and
    concatenates the sampled rows channel-wise per row-count group, so the
    whole-net freeze is a single forward pass with 1-2 output buffers (the
    axon TPU worker faults on programs with many outputs, not large ones).
    Fallback: captures split into depth-ordered groups of <= `max_group`
    tensors, one program each (ancestor truncation keeps shallow groups
    cheap) — used automatically if the fused program crashes the worker.

    With a multi-device `mesh`, calibration images shard across it (data
    parallel — the extraction is embarrassingly image-parallel); results
    are bit-identical to the single-device pass."""
    tensors = tuple(tensors)
    bs = inputs.shape[1]
    # order by production depth so each group's subgraph is a prefix
    order = {t: i for i, l in enumerate(graph.layers) for t in l.tops}
    ordered = sorted(tensors, key=lambda t: order.get(t, 0))
    global _FUSE_DISABLED
    import os
    if (fuse and not _FUSE_DISABLED and len(ordered) > 1
            and not os.environ.get("CP_TPU_NO_FUSE")):
        from jax.errors import JaxRuntimeError
        try:
            return _sample_features_fused(graph, params, inputs, plan,
                                          tuple(ordered), chunk_batches,
                                          compute_dtype, mesh=mesh)
        except JaxRuntimeError as exc:
            from channel_pruning_tpu.utils.runtime import is_worker_crash
            if not is_worker_crash(exc):
                raise
            # a dead worker invalidates this process's client permanently
            # (fresh processes reconnect instantly; in-process polls never
            # do) — mark fused-off in the environment so the CLI's re-exec
            # recovery (cli.main) comes back up on the grouped path
            _FUSE_DISABLED = True
            os.environ["CP_TPU_NO_FUSE"] = "1"
            print("[sampler] TPU worker died during fused freeze; disabling "
                  "the fused path for recovery")
            raise
    groups = [tuple(ordered[i:i + max_group])
              for i in range(0, len(ordered), max_group)]
    chunk_g = next(iter(_chunk_iter(inputs, chunk_batches)))[1]
    place_x, place_p = _mesh_placer(mesh, chunk_g, bs)
    if place_x is not None:
        params = _replicate_params(params, mesh)
    outs: dict[str, list] = {t: [] for t in tensors}
    # chunk-outer / group-inner: the calibration images cross the tunnel ONCE
    # per chunk and every group program reuses the device-resident buffer
    # (groups-outer would re-upload the full image set per group — 3x h2d on
    # VGG's 13 conv captures, and h2d dominates the freeze wall)
    fns = [_feature_chunk_fn(graph, group, bs, compute_dtype)
           for group in groups]
    for lo, hi in _chunk_iter(inputs, chunk_batches):
        runtime_heartbeat()
        x = device_chunk(inputs, lo, hi)
        if place_x is not None:
            x = place_x(x)
        for group, fn in zip(groups, fns):
            ys = {t: jnp.asarray(plan[t][0][lo:hi]) for t in group}
            xs = {t: jnp.asarray(plan[t][1][lo:hi]) for t in group}
            if place_x is not None:
                ys = {t: place_p(v) for t, v in ys.items()}
                xs = {t: place_p(v) for t, v in xs.items()}
            res = fn(params, x, ys, xs)
            # keep device handles — dispatch is async, so the next chunk's
            # compute overlaps this chunk's transfer; fetching here would
            # serialize every chunk on the tunnel round-trip
            for t in group:
                outs[t].append(res[t])
    return {t: np.concatenate([np.asarray(v) for v in vs], axis=0)
            for t, vs in outs.items()}


def _sample_features_fused(graph: Graph, params, inputs: np.ndarray,
                           plan: Mapping[str, tuple[np.ndarray, np.ndarray]],
                           ordered: tuple[str, ...], chunk_batches: int,
                           compute_dtype: str | None,
                           mesh=None) -> dict[str, np.ndarray]:
    """One-pass freeze: a single program gathers all tensors; outputs are
    channel-concatenated per row-count group and split host-side (one tunnel
    transfer per group per chunk)."""
    bs = inputs.shape[1]
    shapes = shapes_of(graph, batch=bs)
    fn = _feature_chunk_fn(graph, ordered, bs, compute_dtype, fuse=True)
    chunk_g = next(iter(_chunk_iter(inputs, chunk_batches)))[1]
    place_x, place_p = _mesh_placer(mesh, chunk_g, bs)
    if place_x is not None:
        params = _replicate_params(params, mesh)
    fused: dict[int, list] = {}
    meta: dict[int, list[tuple[str, int]]] | None = None
    for lo, hi in _chunk_iter(inputs, chunk_batches):
        runtime_heartbeat()
        g = hi - lo
        if meta is None:  # _chunk_iter yields uniform chunk sizes
            meta = {}
            for t in ordered:  # same key/order rule as the traced grouping
                shp, p = shapes[t], plan[t][0].shape[1]
                if len(shp) != 4 or p == 0:
                    key, w = g * bs, int(np.prod(shp[1:]))
                else:
                    key, w = g * p * bs, int(shp[1])
                meta.setdefault(key, []).append((t, w))
        x = device_chunk(inputs, lo, hi)
        ys = {t: jnp.asarray(plan[t][0][lo:hi]) for t in ordered}
        xs = {t: jnp.asarray(plan[t][1][lo:hi]) for t in ordered}
        if place_x is not None:
            x = place_x(x)
            ys = {t: place_p(v) for t, v in ys.items()}
            xs = {t: place_p(v) for t, v in xs.items()}
        res = fn(params, x, ys, xs)
        for key in meta:  # device handles: async dispatch overlaps transfer
            fused.setdefault(key, []).append(res[key])
    out: dict[str, np.ndarray] = {}
    for key, tw in meta.items():
        whole = np.concatenate([np.asarray(v) for v in fused[key]], axis=0)
        off = 0
        for t, w in tw:
            out[t] = whole[:, off:off + w]
            off += w
    return out


def sample_patches(graph: Graph, params, inputs: np.ndarray, conv: str,
                   plan: Mapping[str, tuple[np.ndarray, np.ndarray]],
                   chunk_batches: int = 25,
                   compute_dtype: str | None = None,
                   mesh=None) -> np.ndarray:
    """Replay the *current* graph and gather the (N, c, kh, kw) input patches
    of `conv` at its planned output points (extract_XY, lib/net.py:534-684).
    The plan is keyed by conv top tensor name. With a multi-device `mesh`
    the replay chunk's image axis shards across it (same SPMD plan as the
    freeze — per-image conv work, no collectives)."""
    l = graph.layer(conv)
    geo = l.conv_geometry()
    bottom = l.bottoms[0]
    top = l.tops[0]
    bs = inputs.shape[1]
    fn = _patch_chunk_fn(graph, bottom, bs, (geo["kh"], geo["kw"]),
                         (geo["sh"], geo["sw"]), (geo["ph"], geo["pw"]),
                         compute_dtype)
    ys_all, xs_all = plan[top]
    chunk_g = next(iter(_chunk_iter(inputs, chunk_batches)))[1]
    place_x, place_p = _mesh_placer(mesh, chunk_g, bs)
    if place_x is not None:
        params = _replicate_params(params, mesh)
    outs = []
    for lo, hi in _chunk_iter(inputs, chunk_batches):
        runtime_heartbeat()
        x = device_chunk(inputs, lo, hi)
        yy, xx = jnp.asarray(ys_all[lo:hi]), jnp.asarray(xs_all[lo:hi])
        if place_x is not None:
            x, yy, xx = place_x(x), place_p(yy), place_p(xx)
        outs.append(np.asarray(fn(params, x, yy, xx)))
    return np.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# frozen cache
# ---------------------------------------------------------------------------

@dataclass
class FrozenCache:
    """The calibration snapshot: inputs + point plan + ground-truth sampled
    responses of the ORIGINAL net (replaces frozen<nBatches>.pickle +
    MemoryData replay, lib/net.py:749-876)."""

    # host array OR a SyntheticInputs spec (device-side generator — the
    # smoke/bench calibration never exists on the host at all)
    inputs: np.ndarray | SyntheticInputs                 # (n_batches, bs, C, H, W)
    plan: dict[str, tuple[np.ndarray, np.ndarray]]       # tensor -> (ys, xs)
    feats: dict[str, np.ndarray]                         # tensor -> sampled rows
    labels: np.ndarray | None = None                     # (n_batches, bs) int
    # HBM-resident copy of `inputs`, memoized by device_inputs(); never
    # serialized (save() writes the host array / synthetic spec only)
    inputs_dev: "jax.Array | None" = dataclasses.field(
        default=None, repr=False, compare=False)

    def device_inputs(self):
        """Device-resident calibration source for replay/sampling. The
        per-layer samplers (sample_patches/sample_features/sample_dense)
        slice whatever source they're given per chunk; handing them the host
        array re-uploads the WHOLE calibration set once per layer (a 3C
        VGG-16 solve paid that ~24x: ~7 GB of h2d for a 300 MB set). One
        chunked upload, memoized — device_chunk slices it in HBM."""
        if isinstance(self.inputs, SyntheticInputs):
            return self.inputs  # generated straight into HBM on demand
        if self.inputs_dev is None:
            from channel_pruning_tpu.utils.runtime import chunked_device_put
            self.inputs_dev = chunked_device_put(np.asarray(self.inputs))
        return self.inputs_dev

    @property
    def batch_size(self) -> int:
        return int(self.inputs.shape[1])

    @property
    def n_batches(self) -> int:
        return int(self.inputs.shape[0])

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if isinstance(self.inputs, SyntheticInputs):
            payload = {"inputs_spec": self.inputs.spec()}
        else:
            payload = {"inputs": self.inputs}
        if self.labels is not None:
            payload["labels"] = self.labels
        for t, (ys, xs) in self.plan.items():
            payload[f"plan_ys::{t}"] = ys
            payload[f"plan_xs::{t}"] = xs
        for t, f in self.feats.items():
            payload[f"feats::{t}"] = f
        # uncompressed: float activations barely compress (374 -> 404 MB for
        # the VGG/500 cache) while zlib costs ~25 s on save + 5 s on load
        np.savez(path, **payload)

    @staticmethod
    def load(path: str | Path) -> "FrozenCache":
        z = np.load(path)
        plan: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        feats: dict[str, np.ndarray] = {}
        for k in z.files:
            if k.startswith("plan_ys::"):
                t = k.split("::", 1)[1]
                plan[t] = (z[k], z[f"plan_xs::{t}"])
            elif k.startswith("feats::"):
                feats[k.split("::", 1)[1]] = z[k]
        inputs = (SyntheticInputs.from_spec(z["inputs_spec"])
                  if "inputs_spec" in z.files else z["inputs"])
        return FrozenCache(inputs=inputs, plan=plan, feats=feats,
                           labels=z["labels"] if "labels" in z.files else None)


def clamp_chunk_for_hbm(graph: Graph, bs: int, chunk_batches: int,
                        budget_bytes: int = 4 << 30) -> int:
    """HBM guard for replay/extraction chunking: the capture-gather consumes
    feature maps at production time, but the (g, bs, C, H, W) regroup still
    materialises one full map per captured tensor — at detection resolutions
    (600^2) a 100-image chunk is a ~29 GB allocation. Bound images/step so
    the largest single map stays ~<= `budget_bytes`."""
    shapes = shapes_of(graph, batch=1)
    per_image = max((int(np.prod(s)) * 4 for s in shapes.values()
                     if len(s) == 4), default=0)
    if not per_image:
        return chunk_batches
    cap = max(1, budget_bytes // (per_image * bs))
    if cap < chunk_batches:
        print(f"[sampler] clamping replay chunk {chunk_batches} -> {cap} "
              f"batches (largest map {per_image / 1e6:.0f} MB/image)")
        return cap
    return chunk_batches


def resnet_share_key(graph: Graph) -> Callable[[str], str]:
    """Map each residual-sum-reachable tensor to its Eltwise junction so all
    branch tops share sample points (lib/net.py:466-497)."""
    groups: dict[str, str] = {}
    for s in graph.by_type(LT.ELTWISE):
        for b in s.bottoms:
            groups[b] = s.tops[0]
        groups[s.tops[0]] = s.tops[0]
    return lambda t: groups.get(t, t)


def freeze_tensor_set(graph: Graph, include_fc: bool = True) -> tuple[str, ...]:
    """The default capture set: every conv top; Eltwise tops+bottoms for
    residual nets (targets + shortcut replay points, lib/net.py:1641-1683);
    FC tops only when the fitfc path needs them (lib/cfgs.py:73) — skipping
    them lets the freeze run the `ancestors_subgraph` WITHOUT the FC stack,
    so fc6/7/8 weights (~470 MB of VGG-16's 528 MB) never cross the link."""
    names = [graph.layer(c).tops[0] for c in graph.convs]
    for e in graph.by_type(LT.ELTWISE):
        names.append(e.tops[0])
        names.extend(e.bottoms)
    if include_fc:
        names.extend(graph.layer(f).tops[0] for f in graph.fcs)
    seen: set = set()
    return tuple(t for t in names if not (t in seen or seen.add(t)))


def params_for_tensors(graph: Graph, params, tensors: Sequence[str]):
    """Filter a params pytree to the layers of `ancestors_subgraph(tensors)`
    — upload only what the truncated freeze program will read."""
    needed = {l.name for l in graph.ancestors_subgraph(tuple(tensors)).layers}
    return {k: v for k, v in params.items() if k in needed}


def freeze(graph: Graph, params, inputs: np.ndarray, *, tensors: Sequence[str] | None = None,
           n_points: int = 10, seed: int = 0, chunk_batches: int = 25,
           share_key: Callable[[str], str] | None = None,
           labels: np.ndarray | None = None, mesh=None,
           include_fc: bool = True) -> FrozenCache:
    """Sample ground-truth responses of every conv top (default) on the given
    calibration batches; for residual nets, Eltwise tops and bottoms are
    included too (targets + shortcut replay points for the residual
    compensation, reference lib/net.py:1641-1683). The graph should have
    ReLUs split (rewrite.split_relu) so conv outputs are addressable.
    With a multi-device `mesh`, the calibration batch shards across it
    (data-parallel sampling; bit-identical results)."""
    chunk_batches = clamp_chunk_for_hbm(graph, int(inputs.shape[1]),
                                        chunk_batches)
    if tensors is None:
        tensors = freeze_tensor_set(graph, include_fc=include_fc)
    shapes = shapes_of(graph, batch=inputs.shape[1])
    plan = make_point_plan(shapes, tensors, inputs.shape[0], n_points, seed,
                           share_key=share_key)
    # the fused whole-net program is only used when its ancestors_subgraph
    # covers the FULL graph — the FC-truncated variant reproducibly kills
    # the axon worker ("kernel fault", 3/3 at 200/230 img/step) while the
    # full-graph program has been stable at 250 across two rounds. Truncated
    # capture sets (fitfc off on FC-heavy nets) take the grouped path.
    covers_full = (len(graph.ancestors_subgraph(tuple(tensors)).layers)
                   == len(graph.layers))
    # single-device: upload the calibration set ONCE and sample from HBM
    # slices; the returned cache memoizes the same copy, so an in-process
    # freeze->solve chain never re-uploads it (with a mesh the chunks are
    # batch-sharded at upload instead — keep that placement)
    inputs_dev = None
    replay_src = inputs
    if (mesh is None or getattr(mesh, "devices", np.empty(1)).size <= 1) \
            and not isinstance(inputs, SyntheticInputs):
        inputs_dev = chunked_device_put(np.asarray(inputs))
        replay_src = inputs_dev
    feats = sample_features(graph, params, replay_src, plan, tensors,
                            chunk_batches=chunk_batches, mesh=mesh,
                            fuse=covers_full)
    if not isinstance(inputs, SyntheticInputs):
        inputs = np.asarray(inputs)
    return FrozenCache(inputs=inputs, plan=plan, feats=feats, labels=labels,
                       inputs_dev=inputs_dev)


# ---------------------------------------------------------------------------
# per-channel statistics (for BN restoration)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _stats_chunk_fn(graph: Graph, tensors: tuple[str, ...]):
    input_name = graph.inputs[0].name

    @jax.jit
    def fn(params, x):
        def tf(v):
            axes = (0, 2, 3) if v.ndim == 4 else (0,)
            n = 1
            for a in axes:
                n *= v.shape[a]
            return (jnp.sum(v, axis=axes), jnp.sum(v * v, axis=axes),
                    jnp.asarray(n, jnp.float32))

        _, caps = run_graph(graph, params, {input_name: x},
                            capture_transforms={t: tf for t in tensors})
        return caps

    return fn


def channel_stats(graph: Graph, params, inputs: np.ndarray,
                  tensors: Sequence[str], chunk_batches: int = 25
                  ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per-channel (mean, std) of each tensor over the whole calibration set
    and all spatial positions — the measurement pass of the reference's
    add_bn (lib/net.py:1001-1019 accumulates mean/var over ~50k images)."""
    tensors = tuple(tensors)
    fn = _stats_chunk_fn(graph, tensors)
    acc: dict[str, list] = {t: [0.0, 0.0, 0.0] for t in tensors}
    for lo, hi in _chunk_iter(inputs, chunk_batches):
        runtime_heartbeat()
        x = device_chunk(inputs, lo, hi)
        res = fn(params, x)
        for t in tensors:
            s, ss, n = res[t]
            acc[t][0] += np.asarray(s, np.float64)
            acc[t][1] += np.asarray(ss, np.float64)
            acc[t][2] += float(n)
    out = {}
    for t, (s, ss, n) in acc.items():
        mean = s / n
        var = np.maximum(ss / n - mean ** 2, 1e-12)
        out[t] = (mean.astype(np.float32), np.sqrt(var).astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# dense capture (FC consumers / fitfc path)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _dense_chunk_fn(graph: Graph, tensors: tuple[str, ...]):
    input_name = graph.inputs[0].name
    graph = graph.ancestors_subgraph(tensors)

    @jax.jit
    def fn(params, x):
        _, caps = run_graph(graph, params, {input_name: x},
                            capture_transforms={t: (lambda v: v)
                                                for t in tensors})
        return caps

    return fn


def sample_dense(graph: Graph, params, inputs: np.ndarray,
                 tensors: Sequence[str], chunk_batches: int = 25
                 ) -> dict[str, np.ndarray]:
    """Capture tensors densely, one row per image: {t: (n_images, ...)}.
    Used for FC consumers (reference stores FC/1x1 tops densely,
    lib/net.py:409-412 fc branch; dic.fitfc path)."""
    tensors = tuple(tensors)
    fn = _dense_chunk_fn(graph, tensors)
    outs: dict[str, list[np.ndarray]] = {t: [] for t in tensors}
    for lo, hi in _chunk_iter(inputs, chunk_batches):
        runtime_heartbeat()
        x = device_chunk(inputs, lo, hi)
        res = fn(params, x)
        for t in tensors:
            outs[t].append(np.asarray(res[t]))
    return {t: np.concatenate(v, axis=0) for t, v in outs.items()}
