"""ctypes binding for the native caffemodel wire indexer.

native/caffemodel.cpp walks the NetParameter wire format once and returns
(layer, blob) records with absolute DATA OFFSETS; the float payloads are
then wrapped zero-copy with np.frombuffer. Mirrors io/caffemodel's pure-
Python decode exactly (same V1 enum mapping, same legacy-shape rules) —
any unsupported construct makes the indexer return -1 and the caller falls
back to the Python parser.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATHS = (
    Path(__file__).resolve().parents[2] / "native" / "libcp_native.so",
    Path("native/libcp_native.so"),
)

_REC = 12
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            if not hasattr(lib, "cp_caffemodel_index"):
                continue  # stale .so without the codec
            lib.cp_caffemodel_index.restype = ctypes.c_int64
            lib.cp_caffemodel_index.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def load_caffemodel_native(path: str | Path):
    """Native-path equivalent of io.caffemodel.load_caffemodel. Returns
    (net_name, [CaffeLayerBlobs]) or None when the .so is absent or the
    file uses a construct the indexer does not support."""
    lib = _load()
    if lib is None:
        return None
    from channel_pruning_tpu.io.caffemodel import _V1_TYPES, CaffeLayerBlobs

    raw = np.fromfile(str(path), dtype=np.uint8)
    n = raw.size
    bufp = raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    noff = ctypes.c_int64(-1)
    nlen = ctypes.c_int64(0)
    count = lib.cp_caffemodel_index(bufp, n, None, 0,
                                    ctypes.byref(noff), ctypes.byref(nlen))
    if count < 0:
        return None
    recs = np.zeros((int(count), _REC), np.int64)
    got = lib.cp_caffemodel_index(
        bufp, n, recs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        count, ctypes.byref(noff), ctypes.byref(nlen))
    if got != count:
        return None

    def _str(off, ln):
        return raw[off:off + ln].tobytes().decode("utf-8", "replace")

    net_name = _str(noff.value, nlen.value) if noff.value >= 0 else ""
    layers: list = []
    for rec in recs:
        if rec[0] == 0:                                   # layer
            name = _str(rec[1], rec[2]) if rec[1] >= 0 else ""
            if rec[5]:                                    # V1 enum type
                ltype = _V1_TYPES.get(int(rec[4]), f"V1_{int(rec[4])}")
            else:
                ltype = _str(rec[3], rec[4]) if rec[3] >= 0 else ""
            layers.append(CaffeLayerBlobs(name=name, type=ltype, blobs=[]))
        else:                                             # blob
            off, cnt, dtype, ndim = int(rec[1]), int(rec[2]), rec[3], int(rec[4])
            if off >= 0:
                dt = "<f8" if dtype == 1 else "<f4"
                width = 8 if dtype == 1 else 4
                data = np.frombuffer(raw, dtype=dt, count=cnt, offset=off)
                if dtype == 1:
                    data = data.astype(np.float32)
                del width
            else:
                data = np.zeros(0, np.float32)
            if ndim:
                data = data.reshape([int(d) for d in rec[5:5 + ndim]])
            if not layers:
                return None  # blob before any layer: malformed
            layers[-1].blobs.append(data)
    return net_name, layers
