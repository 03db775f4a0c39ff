"""Faster-RCNN backbone recovery chain: prune -> distill-finetune -> eval.

The reference publishes 2x/4x VOC mAP for the Faster-RCNN VGG-16 backbone
(README.md:25-26) with detection finetuning delegated to py-faster-rcnn
(README.md:116-119). The in-repo analogue (no detection dataset ships
anywhere): prune the RPN backbone, then recover it by MULTI-HEAD
DISTILLATION against the frozen original — 2-way softmax on rpn_cls_score +
SmoothL1 on rpn_bbox_pred (train/finetune.py HeadSpec) — and report head
fidelity before/after, all through the CLI.

Usage: python tools/frcnn_recovery.py [--work /tmp/frcnn_loop]
       [--data /tmp/digits] [--speeds 2.0,3.0] [--platform cpu]
Writes <work>/frcnn_recovery.json and prints a markdown table.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from channel_pruning_tpu import cli  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/frcnn_loop")
    ap.add_argument("--data", default="/tmp/digits")
    ap.add_argument("--model", default="tiny_frcnn")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--speeds", default="2.0")
    ap.add_argument("--cal-batches", type=int, default=20)
    ap.add_argument("--recover-steps", type=int, default=1500)
    ap.add_argument("--recover-lr", default="1e-2")
    ap.add_argument("--recover-lr-step", type=int, default=1000)
    ap.add_argument("--eval-batches", type=int, default=16)
    ap.add_argument("--input-scale", default="0.0078125",
                    help="transform_param.scale: image-scale pixels would "
                         "saturate the unit-scale random teacher")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    data = Path(args.data)
    if not data.exists():
        from make_digits_dataset import build  # sibling script
        build(data)
    train_dir, val_dir = data / "train", data / "val"
    plat = ["--platform", args.platform] if args.platform else []
    plat += ["--input-scale", args.input_scale]
    t0 = time.time()

    # 1. the frozen original backbone = the distillation teacher
    from channel_pruning_tpu.io import caffe as cio
    from channel_pruning_tpu.models import zoo
    from channel_pruning_tpu.models.vgg import init_params

    g = zoo.get_model(args.model, batch=args.batch,
                      image_size=args.image_size)
    params = init_params(g, seed=0)
    teacher_pt = work / f"{g.name}_teacher.prototxt"
    teacher_w = work / f"{g.name}_teacher.caffemodel"
    cio.export_model(g, params, teacher_pt, teacher_w)
    teacher = ["--teacher-prototxt", str(teacher_pt),
               "--teacher-weights", str(teacher_w)]

    def head_eval(pt, w):
        return cli.main(["eval", "--prototxt", str(pt), "--weights", str(w),
                         "--data-dir", str(val_dir),
                         "--batch", str(args.batch),
                         "--eval-batches", str(args.eval_batches)]
                        + teacher + plat)

    base = head_eval(teacher_pt, teacher_w)
    rows = [{"mode": "original", "loss": base["loss"],
             "cls_agree": base["rpn_cls_score:agree"],
             "bbox_l1": -base["rpn_bbox_pred:neg_mae"]}]
    print(f"[frcnn] teacher self-fidelity: loss {base['loss']:.4f} "
          f"cls agree {base['rpn_cls_score:agree']:.3f}")

    for speed in args.speeds.split(","):
        tag = f"cp{speed}"
        wd = work / tag
        res = cli.main(["prune", "--prototxt", str(teacher_pt), "--weights",
                        str(teacher_w), "--data-dir", str(train_dir),
                        "--mode", "prune", "--speed", speed,
                        "--cal-batches", str(args.cal_batches),
                        "--cal-batch", str(args.batch),
                        "--work-dir", str(wd)] + plat)
        pruned_pt = wd / f"cp_{res.graph.name}.prototxt"
        pruned_w = wd / f"cp_{res.graph.name}.caffemodel"
        from channel_pruning_tpu.utils import flops
        ratio = (flops.total_flops(g, include_fc=False) /
                 max(flops.total_flops(res.graph, include_fc=False), 1))

        dropped = head_eval(pruned_pt, pruned_w)
        cli.main(["finetune", "--prototxt", str(pruned_pt), "--weights",
                  str(pruned_w), "--data-dir", str(train_dir),
                  "--batch", str(args.batch), "--lr", args.recover_lr,
                  "--lr-step", str(args.recover_lr_step),
                  "--clip-gradients", "35",
                  "--steps", str(args.recover_steps),
                  "--work-dir", str(wd)] + teacher + plat)
        rec_pt = wd / f"ft_{res.graph.name}.prototxt"
        rec_w = wd / f"ft_{res.graph.name}.caffemodel"
        rec = head_eval(rec_pt, rec_w)

        gap = dropped["loss"] - base["loss"]
        regained = dropped["loss"] - rec["loss"]
        rows.append({
            "mode": tag, "speedup": round(ratio, 2),
            "loss": dropped["loss"], "loss_recovered": rec["loss"],
            "gap_regained": round(regained / gap, 3) if gap > 1e-9 else None,
            "cls_agree": dropped["rpn_cls_score:agree"],
            "cls_agree_recovered": rec["rpn_cls_score:agree"],
            "bbox_l1": -dropped["rpn_bbox_pred:neg_mae"],
            "bbox_l1_recovered": -rec["rpn_bbox_pred:neg_mae"]})
        print(f"[frcnn] {tag}: {ratio:.2f}x conv-mults, distill loss "
              f"{dropped['loss']:.4f} -> {rec['loss']:.4f} "
              f"(regained {regained / gap:.0%}), cls agree "
              f"{dropped['rpn_cls_score:agree']:.3f} -> "
              f"{rec['rpn_cls_score:agree']:.3f}")

    out = {"rows": rows, "wall_s": round(time.time() - t0, 1),
           "protocol": {"recover_steps": args.recover_steps,
                        "recover_lr": args.recover_lr,
                        "heads": "rpn_cls_score softmax(2-way) + "
                                 "rpn_bbox_pred smooth_l1 vs frozen original"}}
    (work / "frcnn_recovery.json").write_text(json.dumps(out, indent=2))
    print("\n| mode | conv speed-up | distill loss | cls agree | bbox MAE |")
    print("|---|---|---|---|---|")
    for r in rows:
        if r["mode"] == "original":
            print(f"| original | 1.0x | {r['loss']:.4f} | "
                  f"{r['cls_agree']:.3f} | {r['bbox_l1']:.4f} |")
        else:
            print(f"| {r['mode']} | {r['speedup']}x | {r['loss']:.4f} -> "
                  f"{r['loss_recovered']:.4f} | {r['cls_agree']:.3f} -> "
                  f"{r['cls_agree_recovered']:.3f} | {r['bbox_l1']:.4f} -> "
                  f"{r['bbox_l1_recovered']:.4f} |")
    print(f"\ntotal wall: {out['wall_s']}s -> {work}/frcnn_recovery.json")


if __name__ == "__main__":
    main()
