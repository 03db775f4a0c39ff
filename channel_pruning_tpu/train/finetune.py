"""Data-parallel finetuning of a (pruned) graph.

TPU-native replacement for the reference's external `caffe train` step
(README.md:91: SGD, batch 128 over 4 GPUs, lr 1e-5, momentum 0.9, wd 0,
Nesterov default in the programmatic solver, lib/builder.py:15-117;
snapshotting every 20k iters, temp/solver.prototxt:14-15).

Design: one jitted train step over a `jax.sharding.Mesh` — batch sharded on
the "data" axis, parameters replicated; XLA inserts the gradient all-reduce
over ICI (no NCCL-style code, SURVEY.md §2.3). Checkpointing via orbax.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from channel_pruning_tpu.graph.ir import Graph, LT
from channel_pruning_tpu.ops.forward import run_graph
from channel_pruning_tpu.utils.config import FinetuneConfig

P = jax.sharding.PartitionSpec


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int


def logits_tensor_of(graph: Graph) -> str:
    heads = graph.by_type(LT.SOFTMAX, LT.SOFTMAX_LOSS)
    if heads:
        return heads[0].bottoms[0]
    return graph.outputs()[-1]


@dataclass(frozen=True)
class HeadSpec:
    """One loss head for multi-head finetuning.

    The reference finetunes detection backbones inside py-faster-rcnn, whose
    RPN trains with a 2-way softmax on `rpn_cls_score` plus SmoothL1 on
    `rpn_bbox_pred` (reference README.md:116-119 delegates there; the head
    layout is models/faster_rcnn.py here). We express that — and any other
    multi-output net — as a list of HeadSpecs over named graph tensors.

    kinds:
      softmax_ce      — integer labels, softmax cross-entropy (classification)
      softmax_distill — target is the TEACHER's raw head output; loss is
                        cross-entropy against its softmax (soft targets).
                        For conv heads (B, C, H, W) set `classes` to fold the
                        channel axis to (classes, C//classes) — e.g. the RPN
                        2-way anchor scores use classes=2.
      smooth_l1       — Huber/SmoothL1 against the teacher's raw output
                        (Caffe SmoothL1Loss, sigma=1).
    """

    tensor: str
    kind: str = "softmax_ce"
    weight: float = 1.0
    classes: int = 0


def _fold_softmax_axes(t: jax.Array, classes: int) -> jax.Array:
    """(B, C, ...) -> (B, classes, C//classes * prod(...)) so the softmax runs
    over the `classes` axis per anchor/location (Caffe Reshape+Softmax RPN
    idiom)."""
    if classes <= 0:
        return t.reshape(t.shape[0], -1)
    b, c = t.shape[0], t.shape[1]
    rest = int(np.prod(t.shape[2:])) if t.ndim > 2 else 1
    return t.reshape(b, classes, (c // classes) * rest)


def head_loss(spec: HeadSpec, pred: jax.Array, target: jax.Array):
    """Returns (loss, agreement) for one head. `agreement` is the fraction of
    locations where the student's argmax matches the target's (softmax kinds),
    or the negative mean absolute error (smooth_l1) — both 'higher is
    better', used as the recovery metric for non-classification heads."""
    if spec.kind == "softmax_ce":
        loss = optax.softmax_cross_entropy_with_integer_labels(
            pred, target).mean()
        agree = (pred.argmax(-1) == target).mean()
        return loss, agree
    if spec.kind == "softmax_distill":
        p = _fold_softmax_axes(pred, spec.classes)
        t = _fold_softmax_axes(target, spec.classes)
        loss = optax.softmax_cross_entropy(p.swapaxes(1, -1),
                                           jax.nn.softmax(t, axis=1).swapaxes(1, -1)).mean()
        agree = (p.argmax(1) == t.argmax(1)).mean()
        return loss, agree
    if spec.kind == "smooth_l1":
        d = pred - target
        ad = jnp.abs(d)
        loss = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5).mean()
        return loss, -ad.mean()
    raise ValueError(f"unknown head kind {spec.kind!r}")


def distill_heads(graph: Graph) -> tuple[HeadSpec, ...]:
    """Default distillation heads for a graph: the RPN pair for detection
    backbones (models/faster_rcnn.py head names), else a single soft-target
    softmax head on the classifier logits."""
    names = {l.name for l in graph.layers}
    if "rpn_cls_score" in names and "rpn_bbox_pred" in names:
        from channel_pruning_tpu.models.faster_rcnn import frcnn_heads
        return frcnn_heads(graph)
    return (HeadSpec(logits_tensor_of(graph), kind="softmax_distill"),)


def make_teacher_fn(graph: Graph, params: Mapping,
                    heads: tuple[HeadSpec, ...]):
    """Jitted x -> tuple of frozen-teacher head outputs (distillation
    targets). Used when no task dataset exists for the head (the reference's
    detection labels live out-of-repo in py-faster-rcnn)."""
    input_name = graph.inputs[0].name
    tensors = tuple(h.tensor for h in heads)
    dev = jax.tree_util.tree_map(jnp.asarray,
                                 {k: dict(v) for k, v in params.items()})

    @jax.jit
    def teacher(x):
        _, caps = run_graph(graph, dev, {input_name: x}, capture=tensors)
        return tuple(caps[t] for t in tensors)

    return teacher


def make_optimizer(cfg: FinetuneConfig) -> optax.GradientTransformation:
    """SGD + (Nesterov) momentum + step lr decay, matching
    temp/solver.prototxt:1-12 semantics (base_lr, gamma^floor(it/step))."""
    def lr(step):
        return cfg.base_lr * cfg.gamma ** jnp.floor(step / cfg.stepsize)

    tx = [optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)]
    if cfg.weight_decay:
        tx.insert(0, optax.add_decayed_weights(cfg.weight_decay))
    if getattr(cfg, "clip_gradients", 0.0):
        # SolverParameter.clip_gradients semantics: rescale the whole update
        # when the global L2 norm exceeds the threshold
        tx.insert(0, optax.clip_by_global_norm(cfg.clip_gradients))
    tx.append(optax.scale_by_schedule(lambda s: -lr(s)))
    return optax.chain(*tx)


def build_train_step(graph: Graph, cfg: FinetuneConfig,
                     mesh: jax.sharding.Mesh | None = None,
                     donate: bool = True,
                     heads: tuple[HeadSpec, ...] | None = None) -> Callable:
    """Returns step(state, x, y, rng) -> (state, metrics).

    x: (B, C, H, W) float32. Default (heads=None): y: (B,) int32 labels,
    single softmax-CE head. With `heads`, y is a TUPLE of per-head targets
    (labels or teacher outputs per HeadSpec.kind) and the loss is the
    weighted sum — the multi-head finetune used for detection backbones
    (RPN cls + bbox, models/faster_rcnn.py). With a mesh, the batch is
    sharded over the 'data' axis and params are replicated — the pjit
    data-parallel plan (SURVEY.md §2.3 row 'Data parallelism')."""
    input_name = graph.inputs[0].name
    opt = make_optimizer(cfg)
    # Caffe BatchNorm blobs (mean/var/factor) carry lr_mult 0 — statistics are
    # frozen during finetune; the learnable affine lives in the Scale layer
    # (reference addbn chain, lib/net.py:1041-1043). Without this mask, SGD
    # walks the stored statistics and finetuning a freshly-addbn'd 3C net
    # diverges at moderate lr.
    frozen_layers = frozenset(l.name for l in graph.by_type(LT.BN))

    if heads is None:
        logits_t = logits_tensor_of(graph)

        def loss_fn(params, x, y, rng):
            _, caps = run_graph(graph, params, {input_name: x},
                                capture=(logits_t,), train=True, rng=rng)
            logits = caps[logits_t]
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            acc1 = (logits.argmax(-1) == y).mean()
            top5 = jnp.any(jnp.argsort(logits, axis=-1)[:, -5:] == y[:, None], axis=-1)
            return loss, (acc1, top5.mean())
    else:
        tensors = tuple(h.tensor for h in heads)

        def loss_fn(params, x, y, rng):
            _, caps = run_graph(graph, params, {input_name: x},
                                capture=tensors, train=True, rng=rng)
            total = 0.0
            agrees = []
            for spec, target in zip(heads, y):
                l, agree = head_loss(spec, caps[spec.tensor], target)
                total = total + spec.weight * l
                agrees.append(agree)
            # metrics slots keep the single-head names: top1 = first head's
            # agreement, top5 = mean agreement across heads
            return total, (agrees[0], sum(agrees) / len(agrees))

    def step(state_params, state_opt, state_step, x, y, rng):
        (loss, (acc1, acc5)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state_params, x, y, rng)
        updates, new_opt = opt.update(grads, state_opt, state_params)
        if frozen_layers:
            updates = {ln: (jax.tree_util.tree_map(jnp.zeros_like, blobs)
                            if ln in frozen_layers else blobs)
                       for ln, blobs in updates.items()}
        new_params = optax.apply_updates(state_params, updates)
        return new_params, new_opt, state_step + 1, {
            "loss": loss, "top1": acc1, "top5": acc5}

    if mesh is not None:
        repl = jax.sharding.NamedSharding(mesh, P())
        data = jax.sharding.NamedSharding(mesh, P("data"))
        jstep = jax.jit(step,
                        in_shardings=(repl, repl, repl, data, data, repl),
                        out_shardings=(repl, repl, repl, repl),
                        donate_argnums=(0, 1) if donate else ())
    else:
        jstep = jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def wrapped(state: TrainState, x, y, rng) -> tuple[TrainState, dict]:
        p, o, s, m = jstep(state.params, state.opt_state,
                           jnp.asarray(state.step), x, y, rng)
        return TrainState(params=p, opt_state=o, step=int(state.step) + 1), m

    return wrapped


def init_state(graph: Graph, params: Mapping, cfg: FinetuneConfig,
               mesh: jax.sharding.Mesh | None = None) -> TrainState:
    dev = jax.tree_util.tree_map(jnp.asarray, {k: dict(v) for k, v in params.items()})
    if mesh is not None:
        repl = jax.sharding.NamedSharding(mesh, P())
        dev = jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), dev)
    opt = make_optimizer(cfg)
    return TrainState(params=dev, opt_state=opt.init(dev), step=0)


def finetune(graph: Graph, params: Mapping, data_iter, cfg: FinetuneConfig,
             mesh: jax.sharding.Mesh | None = None, max_steps: int | None = None,
             snapshot_dir: str | None = None, log_every: int = 100,
             rng_seed: int = 0, heads: tuple[HeadSpec, ...] | None = None,
             teacher: Callable | None = None) -> TrainState:
    """The `caffe train` loop. `data_iter` yields (x, y) numpy batches.

    With `heads` + `teacher` (a jitted x -> targets-tuple from
    make_teacher_fn), the labels from data_iter are ignored and each batch
    is finetuned against the frozen teacher's head outputs — the recovery
    protocol for detection backbones whose task labels live out-of-repo
    (reference README.md:116-119)."""
    state = init_state(graph, params, cfg, mesh)
    step_fn = build_train_step(graph, cfg, mesh, heads=heads)
    key = jax.random.PRNGKey(rng_seed)
    n = max_steps if max_steps is not None else cfg.max_iter
    ckpt = None
    if snapshot_dir is not None:
        from channel_pruning_tpu.train import checkpoint as ckpt_mod
        ckpt = ckpt_mod.Checkpointer(snapshot_dir)
    from channel_pruning_tpu.utils.runtime import heartbeat
    for i, (x, y) in enumerate(data_iter):
        if i >= n:
            break
        heartbeat()
        key, sub = jax.random.split(key)
        xd = jnp.asarray(x)
        yd = teacher(xd) if teacher is not None else jnp.asarray(y)
        state, metrics = step_fn(state, xd, yd, sub)
        if log_every and (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"[finetune] it {i+1}: loss {m['loss']:.4f} "
                  f"top1 {m['top1']:.3f} top5 {m['top5']:.3f}")
        if ckpt is not None and (i + 1) % cfg.snapshot_every == 0:
            ckpt.save(state, i + 1)
    return state


def synthetic_batches(batch: int, image: int = 224, classes: int = 1000,
                      channels: int = 3, seed: int = 0):
    """Deterministic synthetic (x, y) stream for smoke/bench runs when no
    dataset directory is configured."""
    rng = np.random.default_rng(seed)
    while True:
        x = rng.normal(0, 1, (batch, channels, image, image)).astype(np.float32)
        y = rng.integers(0, classes, (batch,)).astype(np.int32)
        yield x, y
