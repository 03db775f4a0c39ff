"""3C validation on structured (low-rank + noise) VGG-16-shaped weights.

The 3C claim (reference lib/decompose.py:163-319, rankdic lib/net.py:1309-1321)
is about trained nets, whose conv responses concentrate in low-dimensional
channel subspaces. The environment ships no trained VGG-16, so this harness
manufactures the property the algorithm exploits: every conv weight is the
product of an (n x r) channel mixer and an (r x c*kh*kw) basis at the
rankdic-4x rank, plus a controlled noise floor. Acceptance (VERDICT.md
round-1 item 3): ITQ holds (not epscheck-rejected) on >= 80 % of layers and
the final VH+ITQ relative error beats VH-only per layer.

Usage: python tools/structured_3c.py [--cal-batches 50] [--noise 0.05]
Writes /tmp/structured_3c/structured_3c.json and prints a per-layer table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def structured_weights(graph, ranks, noise: float, seed: int = 0) -> dict:
    """He-scaled low-rank(+noise) weights: W = W2 @ W1 with the output-channel
    rank set by `ranks` (the structure ITQ recovers), noise relative to the
    layer's weight RMS."""
    from channel_pruning_tpu.models.vgg import init_params

    rng = np.random.default_rng(seed)
    params = init_params(graph, seed=seed)
    for conv in graph.convs:
        W = np.asarray(params[conv]["W"], np.float32)
        n, c, kh, kw = W.shape
        r = int(ranks.get(conv, max(1, n // 2)))
        if r >= n:
            continue
        A = rng.normal(0, 1, (n, r)).astype(np.float32)
        B = rng.normal(0, 1, (r, c * kh * kw)).astype(np.float32)
        Wlr = (A @ B).reshape(n, c, kh, kw)
        Wlr *= W.std() / max(Wlr.std(), 1e-8)   # keep the He-init scale
        Wn = Wlr + noise * Wlr.std() * rng.normal(0, 1, Wlr.shape)
        params[conv]["W"] = Wn.astype(np.float32)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/structured_3c")
    ap.add_argument("--cal-batches", type=int, default=50)
    ap.add_argument("--cal-batch", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--speed", type=float, default=4.0)
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    from channel_pruning_tpu.models.vgg import VGG16_RANKS_4X, build_vgg16
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import FrozenCache, freeze
    from channel_pruning_tpu.utils.config import default_config
    from channel_pruning_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    wd = Path(args.work)
    wd.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    graph = build_vgg16(batch=args.cal_batch, image_size=args.image_size)
    ranks = c3.ranks_for_speed(VGG16_RANKS_4X, args.speed)
    params = structured_weights(graph, ranks, args.noise)
    graph, params = c3.preprocess(graph, params)

    rng = np.random.default_rng(0)
    inputs = rng.normal(0, 1, (args.cal_batches, args.cal_batch, 3,
                               args.image_size, args.image_size)
                        ).astype(np.float32)
    cfg = default_config()
    cache_path = wd / f"frozen_{inputs.shape[0]}x{inputs.shape[1]}.npz"
    if cache_path.exists():
        cache = FrozenCache.load(cache_path)
    else:
        cache = freeze(graph, to_device_params(params), inputs,
                       n_points=cfg.sample.n_points_per_layer,
                       seed=cfg.sample.seed,
                       chunk_batches=max(cfg.sample.device_batch
                                         // inputs.shape[1], 1))
        cache.save(cache_path)

    res = c3.solve_3c(graph, params, cache, cfg, ranks)

    rows = []
    for r in res.reports:
        if r.rank is None or r.kept is not None:
            continue  # pruning-arm rows carry kept counts; skip here
        rows.append({"conv": r.conv, "rank": r.rank,
                     "rmse_vh": round(r.rmse_before, 4),
                     "rmse_3c": round(r.rmse_after, 4),
                     "itq_held": r.conv not in res.itq_degraded
                     and r.conv not in res.undecomposed})
    n = len(rows)
    held = sum(r["itq_held"] for r in rows)
    improved = sum(r["itq_held"] and r["rmse_3c"] <= r["rmse_vh"] for r in rows)
    out = {"layers": rows, "itq_held": held, "total": n,
           "itq_improved_over_vh": improved,
           "noise": args.noise, "wall_s": round(time.time() - t0, 1)}
    (wd / "structured_3c.json").write_text(json.dumps(out, indent=2))
    print("\n| conv | rank | rMSE VH-only | rMSE 3C | ITQ held |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['conv']} | {r['rank']} | {r['rmse_vh']} | "
              f"{r['rmse_3c']} | {'yes' if r['itq_held'] else 'NO'} |")
    print(f"\nITQ held on {held}/{n} layers; improved over VH-only on "
          f"{improved}/{n}; wall {out['wall_s']}s")
    if n and held / n < 0.8:
        print("FAIL: ITQ hold rate below 80%")
        sys.exit(1)


if __name__ == "__main__":
    main()
