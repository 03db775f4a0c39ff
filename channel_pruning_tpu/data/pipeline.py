"""Input pipeline: the TPU-native equivalent of the Caffe fork's data layers.

The fork exists chiefly for its `ImageData` layer with `new_dim: 256,
bicubic: true` — resize shorter side to 256 with bicubic interpolation, crop
224, BGR mean-file subtraction (reference temp/vgg.prototxt:7-21,
SURVEY.md §2.2). Preprocessing here is a pure jittable function (resize+crop
on device), with a PIL-based folder reader for real images and a synthetic
stream fallback (this environment ships no ImageNet).

Caffe/VGG channel convention: images flow through the net as BGR with the
mean pixel subtracted, no scaling to [0,1].
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

# Caffe ilsvrc mean pixel in BGR order (the standard stand-in for
# temp/bgr.binaryproto's per-pixel mean when only the pixel mean is needed)
BGR_MEAN = np.array([103.939, 116.779, 123.68], np.float32)


@functools.partial(jax.jit, static_argnames=("new_dim", "crop", "random_crop"))
def preprocess(img: jax.Array, *, new_dim: int = 256, crop: int = 224,
               random_crop: bool = False, rng: jax.Array | None = None,
               mean: jax.Array | None = None) -> jax.Array:
    """uint8/float RGB HWC image -> float32 BGR CHW, bicubic shorter-side
    resize to `new_dim`, center (or random) crop `crop`, mean-subtracted."""
    img = img.astype(jnp.float32)
    h, w = img.shape[0], img.shape[1]
    # shorter side -> new_dim, aspect preserved (static shapes require the
    # caller to bucket by orientation; for jit simplicity we resize the
    # shorter side exactly and the longer side proportionally, rounded)
    if h <= w:
        nh, nw = new_dim, max(int(round(w * new_dim / h)), new_dim)
    else:
        nh, nw = max(int(round(h * new_dim / w)), new_dim), new_dim
    # antialias=False = the plain 4-tap Keys kernel (a=-0.5): bit-matches
    # PIL float bicubic on upsample (tests/test_data_pipeline.py golden);
    # OpenCV INTER_CUBIC differs only in kernel sharpness (a=-0.75,
    # ~0.2/255 ripple on a ramp). The Caffe fork's `bicubic: true` is the
    # same no-prefilter 4-tap family.
    img = jax.image.resize(img, (nh, nw, img.shape[2]), method="bicubic",
                           antialias=False)
    if random_crop and rng is not None:
        ky, kx = jax.random.split(rng)
        y0 = jax.random.randint(ky, (), 0, nh - crop + 1)
        x0 = jax.random.randint(kx, (), 0, nw - crop + 1)
    else:
        y0, x0 = (nh - crop) // 2, (nw - crop) // 2
    img = jax.lax.dynamic_slice(img, (y0, x0, 0), (crop, crop, img.shape[2]))
    img = img[:, :, ::-1]                       # RGB -> BGR
    m = jnp.asarray(BGR_MEAN) if mean is None else mean
    img = img - m
    return jnp.transpose(img, (2, 0, 1))        # CHW


def load_mean_file(path: str | Path) -> np.ndarray:
    """Load a mean array saved as .npy (CHW or pixel). Caffe binaryproto
    means should be converted once with tools/convert_mean."""
    return np.load(path).astype(np.float32)


def load_binaryproto_mean(path: str | Path,
                          crop: int | None = None) -> np.ndarray:
    """Decode a Caffe mean .binaryproto (BlobProto wire format) to a float32
    (C, H, W) array — the mean file the reference's data layers subtract
    (lib/net.py:812, temp/bgr.binaryproto). With `crop`, center-crop to
    (C, crop, crop): Caffe's DataTransformer applies the mean on the cropped
    window, and `preprocess` here subtracts AFTER the crop."""
    from channel_pruning_tpu.io.caffemodel import _decode_blob

    arr = np.asarray(_decode_blob(memoryview(Path(path).read_bytes())),
                     np.float32)
    while arr.ndim > 3 and arr.shape[0] == 1:
        arr = arr[0]
    if crop is not None and arr.ndim == 3:
        h, w = arr.shape[1], arr.shape[2]
        y0, x0 = (h - crop) // 2, (w - crop) // 2
        arr = arr[:, y0:y0 + crop, x0:x0 + crop]
    return arr


def as_pixel_mean(mean: np.ndarray) -> np.ndarray:
    """(C,H,W) mean file -> HWC-broadcastable form for `preprocess` (which
    subtracts on HWC before the CHW transpose): (H,W,C) for a full mean
    image, (C,) stays per-channel."""
    if mean.ndim == 3:
        return np.transpose(mean, (1, 2, 0))
    return mean


def _list_imagefolder(root: Path) -> tuple[list[Path], list[int], list[str]]:
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    cls_idx = {c: i for i, c in enumerate(classes)}
    files, labels = [], []
    for c in classes:
        for f in sorted((root / c).iterdir()):
            if f.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"):
                files.append(f)
                labels.append(cls_idx[c])
    return files, labels, classes


def imagefolder_batches(root: str | Path, batch: int, *, new_dim: int = 256,
                        crop: int = 224, shuffle: bool = False, seed: int = 0,
                        loop: bool = False, random_crop: bool = False,
                        mean: np.ndarray | None = None
                        ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (x (B,3,crop,crop) float32 BGR, y (B,) int32) from an
    ImageNet-style class-per-directory tree. Uses PIL for decode; device
    bicubic resize for fidelity with the fork's `bicubic: true`."""
    from PIL import Image  # deferred: decode only needed with real data

    root = Path(root)
    files, labels, _ = _list_imagefolder(root)
    order = np.arange(len(files))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    while True:
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch + 1, batch):
            xs, ys = [], []
            for j in order[i:i + batch]:
                with Image.open(files[j]) as im:
                    arr = np.asarray(im.convert("RGB"))
                key, sub = jax.random.split(key)
                xs.append(np.asarray(preprocess(
                    jnp.asarray(arr), new_dim=new_dim, crop=crop,
                    random_crop=random_crop, rng=sub,
                    mean=None if mean is None else jnp.asarray(mean))))
                ys.append(labels[j])
            yield np.stack(xs), np.asarray(ys, np.int32)
        if not loop:
            return


def preload_imagefolder(root: str | Path, *, new_dim: int = 256,
                        crop: int = 224, mean: np.ndarray | None = None
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Decode + preprocess an entire imagefolder once into host arrays
    (X (N,3,crop,crop) float32, y (N,) int32). For small datasets this
    replaces per-epoch re-decode — the analogue of the reference's
    MemoryData preload (lib/net.py:352-356) applied to training."""
    from PIL import Image

    files, labels, _ = _list_imagefolder(Path(root))
    xs = []
    m = None if mean is None else jnp.asarray(mean)
    for f in files:
        with Image.open(f) as im:
            arr = np.asarray(im.convert("RGB"))
        xs.append(np.asarray(preprocess(jnp.asarray(arr), new_dim=new_dim,
                                        crop=crop, mean=m)))
    return np.stack(xs), np.asarray(labels, np.int32)


def memory_batches(X: np.ndarray, y: np.ndarray, batch: int, *,
                   shuffle: bool = False, seed: int = 0, loop: bool = False
                   ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (x, y) batches from preloaded arrays."""
    order = np.arange(len(X))
    rng = np.random.default_rng(seed)
    while True:
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch + 1, batch):
            sel = order[i:i + batch]
            yield X[sel], y[sel]
        if not loop:
            return


def calibration_batches(source, n_batches: int, batch: int,
                        image: int = 224) -> tuple[np.ndarray, np.ndarray | None]:
    """Materialise (n_batches, batch, 3, H, W) calibration inputs (+labels)
    from any (x, y) iterator — the freeze_images input contract
    (lib/net.py:749-802 samples nBatches batches from the train LMDB)."""
    xs, ys = [], []
    for i, (x, y) in enumerate(source):
        if i >= n_batches:
            break
        xs.append(x)
        ys.append(y)
    inputs = np.stack(xs)
    labels = np.stack(ys) if ys and ys[0] is not None else None
    return inputs, labels
