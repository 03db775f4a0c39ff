"""Input pipeline: imagefolder reader + device preprocess + calibration
materialisation (the Caffe fork's ImageData/Data layer contract,
temp/vgg.prototxt:7-21)."""
import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from channel_pruning_tpu.data.pipeline import (BGR_MEAN, calibration_batches,
                                               imagefolder_batches)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(("cat", "dog")):
        d = root / cls
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 256, (40 + 10 * ci, 52, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return root


def test_imagefolder_batches(image_dir):
    batches = list(imagefolder_batches(image_dir, batch=2, new_dim=36, crop=32))
    assert len(batches) == 3
    x, y = batches[0]
    assert x.shape == (2, 3, 32, 32) and x.dtype == np.float32
    assert y.dtype == np.int32 and set(np.concatenate([b[1] for b in batches])) == {0, 1}
    # BGR mean subtracted: uint8 range shifted down (+ bicubic overshoot)
    assert x.min() < 0 and x.max() < 256 - min(BGR_MEAN) + 30


def test_calibration_batches(image_dir):
    src = imagefolder_batches(image_dir, batch=2, new_dim=36, crop=32, loop=True)
    inputs, labels = calibration_batches(src, n_batches=4, batch=2, image=32)
    assert inputs.shape == (4, 2, 3, 32, 32)
    assert labels.shape == (4, 2)


def test_random_crop_differs(image_dir):
    a = list(imagefolder_batches(image_dir, batch=2, new_dim=40, crop=32,
                                 random_crop=True, seed=1))[0][0]
    b = list(imagefolder_batches(image_dir, batch=2, new_dim=40, crop=32,
                                 random_crop=True, seed=2))[0][0]
    assert not np.allclose(a, b)
