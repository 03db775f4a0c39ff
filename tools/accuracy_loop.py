"""The accuracy-recovery acceptance loop on real images.

Miniature, fully-real analogue of the reference's acceptance chain
(README.md:91-100, train.py:106-117): train a model from scratch with this
repo's own finetune loop on the bundled digits imagefolder, then for each
compression mode run  prune -> eval -> finetune-recover -> eval  entirely
through the CLI, and report the accuracy deltas (the analogue of the
README.md:20-26 accuracy table).

Stress preset (VERDICT r2 #1 — put real tension on the recovery loop):
`--stress` trains on a ~160-image subset and compresses 12-32x, which makes
pruning actually COST accuracy; the acceptance bar is that CLI finetune
recovers >=80% of the drop. Default modes reproduce the round-2 table.

Usage: python tools/accuracy_loop.py [--work /tmp/digits_loop]
       [--data /tmp/digits] [--modes 2.0,4.0,3c] [--stress]
Writes <work>/accuracy_loop.json and prints a markdown table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from channel_pruning_tpu import cli  # noqa: E402


EXTRA: list = []  # global CLI flags (e.g. --input-scale), set in main()


def ev(prototxt, weights, data_val, batch=61):
    return cli.main(["eval", "--prototxt", str(prototxt), "--weights",
                     str(weights), "--data-dir", str(data_val),
                     "--batch", str(batch)] + EXTRA)


def subset_imagefolder(src: Path, dst: Path, limit: int, seed: int = 0):
    """Class-balanced subset of an imagefolder (hard-links, no copies)."""
    import numpy as np
    import os

    if dst.exists():
        return dst
    rng = np.random.default_rng(seed)
    classes = sorted(d for d in src.iterdir() if d.is_dir())
    per = max(1, limit // len(classes))
    for c in classes:
        files = sorted(c.iterdir())
        pick = rng.choice(len(files), min(per, len(files)), replace=False)
        outd = dst / c.name
        outd.mkdir(parents=True, exist_ok=True)
        for i in pick:
            os.link(files[i], outd / files[i].name)
    n = sum(1 for c in dst.iterdir() for _ in c.iterdir())
    print(f"[loop] train subset: {n} images -> {dst}")
    return dst


def parse_mode(mode: str):
    """'2.0' -> prune@2x; '3c' -> 3c@4x; '3c8' -> 3c@8x."""
    mode = mode.strip()
    if mode.startswith("3c"):
        speed = mode[2:] or "4.0"
        return True, speed, f"3c{speed}" if mode[2:] else "3c"
    return False, mode, f"cp{mode}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/digits_loop")
    ap.add_argument("--data", default="/tmp/digits")
    ap.add_argument("--arch", default="digits_vgg",
                    help="registry model to train/prune/recover (e.g. "
                         "tiny_xception for the depthwise-separable family)")
    ap.add_argument("--train-lr", default="1e-3")
    ap.add_argument("--train-batch", default="64")
    ap.add_argument("--input-scale", default=None,
                    help="transform_param.scale for every stage (train/"
                         "calibrate/eval); scale-sensitive families "
                         "(xception: frozen near-identity BN at init) need "
                         "~1/128 to train from scratch on pixel data")
    ap.add_argument("--modes", default="2.0,4.0,3c")
    ap.add_argument("--train-steps", type=int, default=800)
    ap.add_argument("--recover-steps", type=int, default=400)
    ap.add_argument("--recover-lr", default="1e-4")
    ap.add_argument("--recover-lr-step", type=int, default=0,
                    help="step-decay the recovery lr (solver.prototxt policy)")
    ap.add_argument("--recover-clip", default="35",
                    help="clip_gradients for the recovery finetune (outlier "
                         "batches NaN the factored 3C chains without it)")
    ap.add_argument("--addbn", action="store_true",
                    help="insert measured BN before the recovery finetune of "
                         "3C modes (the reference's addbn step, "
                         "train.py:106-117 — stabilises finetuning the "
                         "decomposed V/H/P chains)")
    ap.add_argument("--cal-batches", type=int, default=50)
    ap.add_argument("--train-limit", type=int, default=0,
                    help="train on a class-balanced subset of N images")
    ap.add_argument("--stress", action="store_true",
                    help="preset: 160-image train split, 12-32x compression "
                         "(prune must cost >=5 points; recovery must restore "
                         ">=80%% of the drop)")
    args = ap.parse_args()
    if args.input_scale:
        EXTRA.extend(["--input-scale", args.input_scale])
    if args.stress:
        args.train_limit = args.train_limit or 160
        if args.modes == "2.0,4.0,3c":
            args.modes = "12.0,20.0,32.0,3c8"
        args.recover_steps = max(args.recover_steps, 600)

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    data = Path(args.data)
    if not data.exists():
        from make_digits_dataset import build  # sibling script
        build(data)
    train_dir, val_dir = data / "train", data / "val"
    if args.train_limit:
        train_dir = subset_imagefolder(train_dir,
                                       work / f"train_{args.train_limit}",
                                       args.train_limit)
    t0 = time.time()

    # 1. train from scratch with the repo's own finetune loop
    ft_pt = work / f"ft_{args.arch}.prototxt"
    ft_w = work / f"ft_{args.arch}.caffemodel"
    if not ft_w.exists():
        cli.main(["finetune", "--model", args.arch, "--data-dir",
                  str(train_dir), "--batch", args.train_batch,
                  "--lr", args.train_lr,
                  "--lr-step", "500", "--steps", str(args.train_steps),
                  "--work-dir", str(work)] + EXTRA)
    base = ev(ft_pt, ft_w, val_dir)
    print(f"[loop] baseline val top1 {base['accuracy@1']:.4f}")

    rows = [{"mode": "baseline", "speedup": 1.0,
             "top1": base["accuracy@1"], "top5": base.get("accuracy@5"),
             "top1_recovered": base["accuracy@1"]}]

    for mode in args.modes.split(","):
        is_3c, speed, tag = parse_mode(mode)
        wd = work / tag
        prefix = "3C" if is_3c else "cp"
        pruned_pt = wd / f"{prefix}_{args.arch}.prototxt"
        pruned_w = wd / f"{prefix}_{args.arch}.caffemodel"
        res = cli.main(["prune", "--prototxt", str(ft_pt), "--weights",
                        str(ft_w), "--data-dir", str(train_dir),
                        "--mode", "3c" if is_3c else "prune",
                        "--speed", speed,
                        "--cal-batches", str(args.cal_batches),
                        "--cal-batch", "10", "--work-dir", str(wd)] + EXTRA)
        from channel_pruning_tpu.utils import flops
        base_g, _ = cli._load_model(argparse.Namespace(
            prototxt=str(ft_pt), weights=None, batch=61, image_size=None,
            model=None))
        ratio = (flops.total_flops(base_g, include_fc=False) /
                 max(flops.total_flops(res.graph, include_fc=False), 1))

        pruned = ev(pruned_pt, pruned_w, val_dir)
        if is_3c and args.addbn:
            cli.main(["addbn", "--prototxt", str(pruned_pt), "--weights",
                      str(pruned_w), "--data-dir", str(train_dir),
                      "--cal-batches", str(args.cal_batches),
                      "--cal-batch", "10", "--work-dir", str(wd)] + EXTRA)
            pruned_pt = wd / f"bn_{res.graph.name}.prototxt"
            pruned_w = wd / f"bn_{res.graph.name}.caffemodel"
        ft_args = ["finetune", "--prototxt", str(pruned_pt), "--weights",
                   str(pruned_w), "--data-dir", str(train_dir), "--batch",
                   "64", "--lr", args.recover_lr,
                   "--steps", str(args.recover_steps),
                   "--clip-gradients", args.recover_clip,
                   "--work-dir", str(wd)]
        if args.recover_lr_step:
            ft_args += ["--lr-step", str(args.recover_lr_step)]
        cli.main(ft_args + EXTRA)
        rec_pt = wd / f"ft_{res.graph.name}.prototxt"
        rec_w = wd / f"ft_{res.graph.name}.caffemodel"
        rec = ev(rec_pt, rec_w, val_dir)
        drop = base["accuracy@1"] - pruned["accuracy@1"]
        regain = rec["accuracy@1"] - pruned["accuracy@1"]
        frac = regain / drop if drop > 1e-9 else float("nan")
        rows.append({"mode": tag, "speedup": round(ratio, 2),
                     "top1": pruned["accuracy@1"],
                     "top5": pruned.get("accuracy@5"),
                     "top1_recovered": rec["accuracy@1"],
                     "top5_recovered": rec.get("accuracy@5"),
                     "drop": round(drop, 4),
                     "recovered_frac": round(frac, 3)})
        print(f"[loop] {tag}: {ratio:.2f}x conv-mults, "
              f"top1 {pruned['accuracy@1']:.4f} -> "
              f"{rec['accuracy@1']:.4f} after recovery "
              f"(drop {drop:+.4f}, recovered {frac:.0%})"
              if drop > 1e-9 else
              f"[loop] {tag}: {ratio:.2f}x, no drop to recover")

    out = {"baseline_top1": base["accuracy@1"], "rows": rows,
           "train_images": args.train_limit or "full",
           "val_images": base["n_images"], "wall_s": round(time.time() - t0, 1)}
    (work / "accuracy_loop.json").write_text(json.dumps(out, indent=2))
    print("\n| mode | conv speed-up | top-1 after prune | top-1 recovered "
          "| delta vs baseline | drop recovered |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        frac = r.get("recovered_frac")
        frac_s = f"{frac:.0%}" if frac is not None and frac == frac else "-"
        print(f"| {r['mode']} | {r['speedup']}x | {r['top1']:.4f} | "
              f"{r['top1_recovered']:.4f} | "
              f"{r['top1_recovered'] - base['accuracy@1']:+.4f} | {frac_s} |")
    print(f"\ntotal wall: {out['wall_s']}s -> {work}/accuracy_loop.json")


if __name__ == "__main__":
    main()
