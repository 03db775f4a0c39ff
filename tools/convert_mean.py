#!/usr/bin/env python3
"""Convert a Caffe mean .binaryproto (BlobProto) to .npy.

The reference subtracts temp/bgr.binaryproto inside its Data layers
(lib/net.py:812); here the mean is a plain array consumed by
data/pipeline.preprocess. Usage:

    python tools/convert_mean.py bgr.binaryproto bgr_mean.npy
"""
import sys

import numpy as np

from channel_pruning_tpu.io.caffemodel import _decode_blob


def main(src: str, dst: str) -> None:
    blob = _decode_blob(memoryview(open(src, "rb").read()))
    arr = np.asarray(blob, np.float32)
    # BlobProto means are (1, C, H, W) or (C, H, W); squeeze the lead dim
    while arr.ndim > 3 and arr.shape[0] == 1:
        arr = arr[0]
    np.save(dst, arr)
    print(f"{src}: shape {arr.shape} -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
