"""Recovery-schedule sweep for the Xception 6x row (VERDICT r4 #4).

The round-4 acceptance table (docs/WALKTHROUGH.md) recovered only 74% of
the 6.26x prune drop with the default schedule (lr 1e-3, step 400, 600
steps) — below the project's own >=80% bar. This script holds the
baseline training and the 6x prune FIXED (cached artifacts) and sweeps
ONLY the recovery finetune: schedule variants plus teacher distillation
(the reference couples every release with a finetune stage,
reference/README.md:91; distillation mirrors its detection recipe,
README.md:116-119, via train/finetune.py HeadSpec softmax_distill).

For the generalisation-cap analysis it also reports TRAIN top-1 after
each recovery: if train accuracy saturates while val stalls, the residual
gap is a generalisation cap of the 305-image digits benchmark, not a
recovery-schedule deficiency.

Usage: python tools/xception_recovery_sweep.py [--work /tmp/xc_sweep]
Writes <work>/sweep.json and prints a markdown table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from channel_pruning_tpu import cli  # noqa: E402

SCALE = ["--input-scale", "0.0078125"]


def ev(prototxt, weights, data_dir, batch=61):
    return cli.main(["eval", "--prototxt", str(prototxt), "--weights",
                     str(weights), "--data-dir", str(data_dir),
                     "--batch", str(batch)] + SCALE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/xc_sweep")
    ap.add_argument("--data", default="/tmp/digits")
    ap.add_argument("--speed", default="6.0")
    ap.add_argument("--configs", default=None,
                    help="comma-separated names to run (default: all)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (accuracy is hardware-"
                         "independent; 'cpu' frees the chip for perf runs)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    data = Path(args.data)
    if not data.exists():
        from make_digits_dataset import build
        build(data)
    train_dir, val_dir = data / "train", data / "val"
    t0 = time.time()

    # 1. baseline (identical command to the round-4 accuracy_loop run)
    ft_pt = work / "ft_tiny_xception.prototxt"
    ft_w = work / "ft_tiny_xception.caffemodel"
    if not ft_w.exists():
        cli.main(["finetune", "--model", "tiny_xception", "--data-dir",
                  str(train_dir), "--batch", "64", "--lr", "3e-3",
                  "--lr-step", "500", "--steps", "800",
                  "--work-dir", str(work)] + SCALE)
    base = ev(ft_pt, ft_w, val_dir)
    base_train = ev(ft_pt, ft_w, train_dir)
    print(f"[sweep] baseline val {base['accuracy@1']:.4f} "
          f"train {base_train['accuracy@1']:.4f}")

    # 2. prune at 6x once, reused by every recovery config
    pdir = work / "pruned"
    pruned_pt = pdir / "cp_tiny_xception.prototxt"
    pruned_w = pdir / "cp_tiny_xception.caffemodel"
    if not pruned_w.exists():
        cli.main(["prune", "--prototxt", str(ft_pt), "--weights", str(ft_w),
                  "--data-dir", str(train_dir), "--mode", "prune",
                  "--speed", args.speed, "--cal-batches", "50",
                  "--cal-batch", "10", "--work-dir", str(pdir)] + SCALE)
    pruned = ev(pruned_pt, pruned_w, val_dir)
    drop = base["accuracy@1"] - pruned["accuracy@1"]
    print(f"[sweep] pruned val {pruned['accuracy@1']:.4f} (drop {drop:.4f}; "
          f">=80% bar needs val >= "
          f"{pruned['accuracy@1'] + 0.8 * drop:.4f})")

    distill = ["--teacher-prototxt", str(ft_pt), "--teacher-weights",
               str(ft_w)]
    configs = {
        # round-4 published schedule, as the control
        "r4-control": ["--lr", "1e-3", "--lr-step", "400", "--steps", "600"],
        "long": ["--lr", "1e-3", "--lr-step", "700", "--steps", "1600"],
        "hot": ["--lr", "2e-3", "--lr-step", "450", "--steps", "1200"],
        "distill": ["--lr", "1e-3", "--lr-step", "500",
                    "--steps", "1200"] + distill,
        "distill-hot": ["--lr", "2e-3", "--lr-step", "500",
                        "--steps", "1500"] + distill,
    }
    if args.configs:
        keep = set(args.configs.split(","))
        configs = {k: v for k, v in configs.items() if k in keep}

    rows = []
    for name, extra in configs.items():
        wd = work / name
        rec_pt = wd / "ft_tiny_xception.prototxt"
        rec_w = wd / "ft_tiny_xception.caffemodel"
        if not rec_w.exists():
            cli.main(["finetune", "--prototxt", str(pruned_pt), "--weights",
                      str(pruned_w), "--data-dir", str(train_dir),
                      "--batch", "64", "--clip-gradients", "35",
                      "--work-dir", str(wd)] + extra + SCALE)
        rec = ev(rec_pt, rec_w, val_dir)
        rec_train = ev(rec_pt, rec_w, train_dir)
        frac = (rec["accuracy@1"] - pruned["accuracy@1"]) / max(drop, 1e-9)
        rows.append({"config": name, "val_top1": rec["accuracy@1"],
                     "train_top1": rec_train["accuracy@1"],
                     "recovered_frac": round(frac, 3)})
        print(f"[sweep] {name}: val {rec['accuracy@1']:.4f} "
              f"train {rec_train['accuracy@1']:.4f} "
              f"recovered {frac:.0%}")

    out = {"baseline_val": base["accuracy@1"],
           "baseline_train": base_train["accuracy@1"],
           "pruned_val": pruned["accuracy@1"], "drop": round(drop, 4),
           "rows": rows, "wall_s": round(time.time() - t0, 1)}
    (work / "sweep.json").write_text(json.dumps(out, indent=2))
    print("\n| config | val top-1 | train top-1 | drop recovered |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['val_top1']:.4f} | "
              f"{r['train_top1']:.4f} | {r['recovered_frac']:.0%} |")
    print(f"\ntotal wall: {out['wall_s']}s -> {work}/sweep.json")


if __name__ == "__main__":
    main()
