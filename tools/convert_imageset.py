"""Build a Caffe LMDB from an imagefolder — the analogue of Caffe's
`convert_imageset` tool (how the reference's users produce the ImageNet
LMDBs its `Data` layer reads, lib/cfgs.py:14-15).

Writes encoded Datums (original image bytes, `encoded=true`) so the
Data-layer path decodes + preprocesses exactly like the ImageData source.
Labels follow data/pipeline._list_imagefolder's sorted-class convention so
an LMDB built from `val/` evaluates identically to `--data-dir val/`.

Usage: python tools/convert_imageset.py <imagefolder> <out_lmdb_dir>
       [--shuffle] [--seed 0]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from channel_pruning_tpu.data.lmdb import Datum, encode_datum, write_lmdb  # noqa: E402
from channel_pruning_tpu.data.pipeline import _list_imagefolder  # noqa: E402


def build(root: Path, out: Path, shuffle: bool = False, seed: int = 0) -> int:
    files, labels, classes = _list_imagefolder(root)
    order = np.arange(len(files))
    if shuffle:
        order = np.random.default_rng(seed).permutation(len(files))
    items = []
    for key_i, i in enumerate(order):
        d = Datum(data=files[i].read_bytes(), label=int(labels[i]),
                  encoded=True)
        # Caffe convert_imageset key convention: zero-padded index + path
        key = (b"%08d_" % key_i) + str(files[i].name).encode()
        items.append((key, encode_datum(d)))
    write_lmdb(out, items)
    print(f"[convert_imageset] {len(items)} images, {len(classes)} classes "
          f"-> {out}/data.mdb")
    return len(items)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--shuffle", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    build(a.root, a.out, shuffle=a.shuffle, seed=a.seed)


if __name__ == "__main__":
    main()
