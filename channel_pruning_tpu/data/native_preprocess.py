"""ctypes bindings for the native (C++/OpenMP) input-pipeline kernels.

native/preprocess.cpp implements the Caffe fork's ImageData hot path
(bicubic shorter-side resize + crop + BGR mean, temp/vgg.prototxt:7-14) as a
C library. Build with `make -C native`; everything here degrades gracefully
to the pure-JAX `data.pipeline.preprocess` when the .so is absent.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from channel_pruning_tpu.data.pipeline import BGR_MEAN

_LIB_PATHS = (
    Path(__file__).resolve().parents[2] / "native" / "libcp_native.so",
    Path("native/libcp_native.so"),
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.cp_preprocess_image.restype = ctypes.c_int
            lib.cp_preprocess_image.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.cp_preprocess_batch.restype = ctypes.c_int
            lib.cp_preprocess_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            lib.cp_num_threads.restype = ctypes.c_int
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.cp_num_threads() if lib else 0


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_image(img: np.ndarray, *, new_dim: int = 256, crop: int = 224,
                     crop_yx: tuple[int, int] = (-1, -1),
                     mean: np.ndarray | None = None) -> np.ndarray:
    """uint8 RGB HWC -> float32 BGR CHW (native path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libcp_native.so not built (run `make -C native`)")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, ch = img.shape
    m = np.ascontiguousarray(BGR_MEAN if mean is None else mean, np.float32)
    out = np.empty((3, crop, crop), np.float32)
    rc = lib.cp_preprocess_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, ch,
        new_dim, crop, crop_yx[0], crop_yx[1], _fptr(m), _fptr(out))
    if rc != 0:
        raise ValueError(f"cp_preprocess_image failed rc={rc} (h={h}, w={w})")
    return out


def preprocess_batch(imgs: np.ndarray, *, new_dim: int = 256, crop: int = 224,
                     crop_yx: np.ndarray | None = None,
                     mean: np.ndarray | None = None) -> np.ndarray:
    """uint8 RGB NHWC (uniform sizes) -> float32 BGR NCHW, OpenMP-parallel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libcp_native.so not built (run `make -C native`)")
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, ch = imgs.shape
    m = np.ascontiguousarray(BGR_MEAN if mean is None else mean, np.float32)
    out = np.empty((n, 3, crop, crop), np.float32)
    cyx = None
    cyx_ptr = ctypes.POINTER(ctypes.c_int)()
    if crop_yx is not None:
        cyx = np.ascontiguousarray(crop_yx, np.int32)
        cyx_ptr = cyx.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    rc = lib.cp_preprocess_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, ch,
        new_dim, crop, cyx_ptr, _fptr(m), _fptr(out))
    if rc != 0:
        raise ValueError(f"cp_preprocess_batch failed rc={rc}")
    return out
