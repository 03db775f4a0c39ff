"""Top-1 / top-5 evaluation harness.

Replaces `caffe test -iterations 5000` (README.md:100; lib/net.py:1755-1760)
and the running accuracy accumulation during sampling (lib/net.py:948-955):
a jitted batched forward computing logits, accumulated over an iterator.
"""
from __future__ import annotations

from typing import Iterable, Mapping

import jax
import jax.numpy as jnp

from channel_pruning_tpu.graph.ir import Graph
from channel_pruning_tpu.ops.forward import run_graph
from channel_pruning_tpu.train.finetune import logits_tensor_of

P = jax.sharding.PartitionSpec


def build_eval_step(graph: Graph, mesh: jax.sharding.Mesh | None = None):
    logits_t = logits_tensor_of(graph)
    input_name = graph.inputs[0].name

    def step(params, x, y):
        _, caps = run_graph(graph, params, {input_name: x}, capture=(logits_t,))
        logits = caps[logits_t]
        top1 = (logits.argmax(-1) == y).sum()
        top5 = jnp.any(jnp.argsort(logits, axis=-1)[:, -5:] == y[:, None],
                       axis=-1).sum()
        return top1, top5

    if mesh is not None:
        repl = jax.sharding.NamedSharding(mesh, P())
        data = jax.sharding.NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data, data),
                       out_shardings=(repl, repl))
    return jax.jit(step)


def evaluate(graph: Graph, params: Mapping, batches: Iterable, *,
             mesh: jax.sharding.Mesh | None = None, max_batches: int | None = None,
             verbose: bool = False) -> dict[str, float]:
    """Accumulate top-1/top-5 over (x, y) numpy batches. Returns accuracies
    (the reference's `accuracy@1`/`accuracy@5` names, lib/cfgs.py:65)."""
    step = build_eval_step(graph, mesh)
    dev = jax.tree_util.tree_map(jnp.asarray, {k: dict(v) for k, v in params.items()})
    # keep the per-batch counts as DEVICE scalars: int(a) every step would
    # serialize the whole eval on the host round-trip (a real 50k-image run
    # over the tunnel pays ~25 ms latency per sync); fetch once at the end
    from channel_pruning_tpu.utils.runtime import heartbeat
    n = 0
    counts: list = []
    for i, (x, y) in enumerate(batches):
        heartbeat()
        if max_batches is not None and i >= max_batches:
            break
        counts.append(step(dev, jnp.asarray(x), jnp.asarray(y)))
        n += x.shape[0]
        if verbose and (i + 1) % 50 == 0:
            t1 = sum(int(a) for a, _ in counts)
            t5 = sum(int(b) for _, b in counts)
            print(f"[eval] {i+1} batches: top1 {t1/n:.4f} top5 {t5/n:.4f}")
    t1 = sum(int(a) for a, _ in counts)
    t5 = sum(int(b) for _, b in counts)
    return {"accuracy@1": t1 / max(n, 1), "accuracy@5": t5 / max(n, 1),
            "n_images": n}


def evaluate_heads(graph: Graph, params: Mapping, teacher, heads,
                   batches: Iterable, *, max_batches: int | None = None) -> dict:
    """Head-level fidelity of a (pruned) multi-head net vs its frozen
    teacher: per-head agreement (argmax match for softmax heads, -MAE for
    smooth_l1 — see train.finetune.head_loss) plus the weighted loss. This
    is the detection-backbone analogue of top-1/top-5: the reference's VOC
    mAP eval lives out-of-repo (README.md:116-119), so head fidelity against
    the original backbone is the in-repo recovery metric."""
    from channel_pruning_tpu.train.finetune import head_loss

    input_name = graph.inputs[0].name
    tensors = tuple(h.tensor for h in heads)
    dev = jax.tree_util.tree_map(jnp.asarray,
                                 {k: dict(v) for k, v in params.items()})

    @jax.jit
    def step(p, x, targets):
        _, caps = run_graph(graph, p, {input_name: x}, capture=tensors)
        losses, agrees = [], []
        for spec, tgt in zip(heads, targets):
            l, a = head_loss(spec, caps[spec.tensor], tgt)
            losses.append(spec.weight * l)
            agrees.append(a)
        return jnp.stack(losses), jnp.stack(agrees)

    acc_l = acc_a = None
    n = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        x = batch[0] if isinstance(batch, tuple) else batch
        xd = jnp.asarray(x)
        losses, agrees = step(dev, xd, teacher(xd))
        acc_l = losses if acc_l is None else acc_l + losses
        acc_a = agrees if acc_a is None else acc_a + agrees
        n += 1
    out = {"n_batches": n, "loss": float(acc_l.sum()) / max(n, 1)}
    for j, h in enumerate(heads):
        out[f"{h.tensor}:{'agree' if h.kind != 'smooth_l1' else 'neg_mae'}"] = (
            float(acc_a[j]) / max(n, 1))
        out[f"{h.tensor}:loss"] = float(acc_l[j]) / max(n, 1)
    return out


def evaluate_cache(graph: Graph, params, cache, *, max_batches=None,
                   mesh: jax.sharding.Mesh | None = None) -> dict[str, float]:
    """Accuracy over the frozen calibration batches — the reference's
    `accuracy(times)` replay harness over memory_preload batches
    (lib/net.py:929-946). Requires the cache to carry labels."""
    if cache.labels is None:
        raise ValueError("frozen cache has no labels (synthetic calibration)")

    def batches():
        n = cache.n_batches if max_batches is None else min(max_batches,
                                                            cache.n_batches)
        for i in range(n):
            yield cache.inputs[i], cache.labels[i]

    return evaluate(graph, params, batches(), mesh=mesh)
