"""Materialise sklearn's bundled handwritten-digits set as an imagefolder.

The environment ships no ImageNet/CIFAR; the only *real* image dataset baked
in is sklearn.datasets.load_digits (1,797 8x8 grayscale handwritten digits,
10 classes). This tool writes them as 32x32 RGB PNGs in the ImageNet-style
class-per-directory layout that data/pipeline.imagefolder_batches reads, so
the full reference chain — train -> freeze -> prune -> addbn -> finetune ->
eval (reference train.py:106-117, README.md:91-100) — runs on real images
end to end.

Usage: python tools/make_digits_dataset.py [root] [--size 32] [--val-frac 0.17]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build(root: Path, size: int = 32, val_frac: float = 0.17, seed: int = 0):
    from PIL import Image
    from sklearn.datasets import load_digits

    digits = load_digits()
    images = digits.images            # (1797, 8, 8) float in [0, 16]
    labels = digits.target
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(images))
    n_val = int(round(val_frac * len(images)))
    splits = {"val": order[:n_val], "train": order[n_val:]}
    for split, idxs in splits.items():
        for i in idxs:
            arr = np.clip(images[i] * (255.0 / 16.0), 0, 255).astype(np.uint8)
            im = Image.fromarray(arr, mode="L").resize((size, size),
                                                       Image.BICUBIC)
            d = root / split / f"{labels[i]}"
            d.mkdir(parents=True, exist_ok=True)
            im.convert("RGB").save(d / f"{i:04d}.png")
    counts = {s: len(v) for s, v in splits.items()}
    print(f"digits imagefolder -> {root} ({counts})")
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="/tmp/digits")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--val-frac", type=float, default=0.17)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build(Path(args.root), size=args.size, val_frac=args.val_frac,
          seed=args.seed)


if __name__ == "__main__":
    main()
