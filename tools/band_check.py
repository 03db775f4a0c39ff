"""Structural fidelity check of a pruned artifact against the released
models:

* ResNet-50 2x (reference temp/resnet-50-cp.prototxt): branch2a/branch2b
  widths inside the released rank_tol band + the 16 Filter gate counts.
* VGG-16 5x (reference temp/channel_pruning.prototxt): the 10 pruned conv
  widths, matched EXACTLY (released-table runs use solve.band=bottom, which
  lands on the exact counts).

Usage: python tools/band_check.py <pruned.prototxt> [--family auto|resnet50|vgg16]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from channel_pruning_tpu.io import caffe as cio  # noqa: E402
from channel_pruning_tpu.models.resnet import (  # noqa: E402
    RESNET50_2X_BRANCH2A, RESNET50_2X_BRANCH2B, RESNET50_2X_FILTERS)


def check_vgg(g, widths) -> int:
    """Exact-match check against the released 5x table
    (models/vgg.VGG16_5X_CHANNELS = temp/channel_pruning.prototxt widths).
    conv5_x stays unpruned in the released model and is skipped when absent
    from the artifact's conv set."""
    from channel_pruning_tpu.models.vgg import VGG16_5X_CHANNELS

    exact = off = 0
    for name, target in VGG16_5X_CHANNELS.items():
        got = widths.get(name)
        if got is None:
            continue
        if got == target:
            exact += 1
        else:
            off += 1
            print(f"  {name:18s} released {target:4d} got {got} MISMATCH")
    print(f"[band_check] vgg16 widths exactly matching released table: "
          f"{exact}/{exact + off}")
    return 0 if off == 0 else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prototxt")
    ap.add_argument("--rank-tol", type=float, default=0.1)
    ap.add_argument("--family", choices=("auto", "resnet50", "vgg16"),
                    default="auto")
    args = ap.parse_args()

    g, _ = cio.import_model(args.prototxt, None, batch=1)
    widths = {l.name: int(l.attr("num_output")) for l in g.layers
              if l.attr("num_output") is not None}

    family = args.family
    if family == "auto":
        family = "resnet50" if any("branch2a" in n for n in widths) else "vgg16"
    if family == "vgg16":
        return check_vgg(g, widths)

    in_band = out_band = 0
    rows = []
    for table in (RESNET50_2X_BRANCH2A, RESNET50_2X_BRANCH2B):
        for name, target in table.items():
            got = widths.get(name)
            hi = int(round(target * (1 + args.rank_tol)))
            ok = got is not None and target <= got <= hi
            in_band += ok
            out_band += not ok
            rows.append((name, target, hi, got, "in" if ok else "OUT"))
    for name, target, hi, got, mark in rows:
        if mark == "OUT":
            print(f"  {name:18s} released {target:4d} band [{target},{hi}] "
                  f"got {got} {mark}")
    print(f"[band_check] branch widths in released band: "
          f"{in_band}/{in_band + out_band} (rank_tol {args.rank_tol})")

    # Filter/Select gates: count + keep sizes
    from channel_pruning_tpu.graph.ir import LT
    gates = {l.name: int(l.attr("num_output") or 0) for l in g.layers
             if l.type == LT.SELECT and not l.attr("passthrough", False)}
    print(f"[band_check] select/filter gates: {len(gates)} "
          f"(released model: {len(RESNET50_2X_FILTERS)})")
    return 0 if out_band <= 2 else 1


if __name__ == "__main__":
    sys.exit(main())
