"""Native (C++/OpenMP) preprocess vs the pure-JAX device path: the two
implementations of the Caffe fork's bicubic-256/crop-224/BGR-mean contract
must agree."""
import numpy as np
import pytest

from channel_pruning_tpu.data import native_preprocess as npp
from channel_pruning_tpu.data.pipeline import preprocess

pytestmark = pytest.mark.skipif(not npp.available(),
                                reason="libcp_native.so not built")


def test_native_matches_jax_bicubic(rng):
    import jax.numpy as jnp

    img = rng.integers(0, 256, (300, 400, 3)).astype(np.uint8)
    got = npp.preprocess_image(img, new_dim=256, crop=224)
    want = np.asarray(preprocess(jnp.asarray(img), new_dim=256, crop=224))
    assert got.shape == want.shape == (3, 224, 224)
    # interiors must agree tightly; borders differ by clamp handling
    diff = np.abs(got[:, 4:-4, 4:-4] - want[:, 4:-4, 4:-4])
    assert diff.max() < 1.5, diff.max()  # < 1.5/255 of dynamic range
    assert diff.mean() < 0.1


def test_native_batch_matches_single(rng):
    imgs = rng.integers(0, 256, (8, 260, 320, 3)).astype(np.uint8)
    batch = npp.preprocess_batch(imgs, new_dim=256, crop=224)
    one = npp.preprocess_image(imgs[3], new_dim=256, crop=224)
    np.testing.assert_array_equal(batch[3], one)
    assert npp.num_threads() >= 1


def test_native_random_crop_coords(rng):
    img = rng.integers(0, 256, (256, 300, 3)).astype(np.uint8)
    a = npp.preprocess_image(img, new_dim=256, crop=200, crop_yx=(0, 0))
    b = npp.preprocess_image(img, new_dim=256, crop=200, crop_yx=(10, 30))
    assert not np.array_equal(a, b)


def test_tall_image_resize(rng):
    img = rng.integers(0, 256, (500, 250, 3)).astype(np.uint8)
    out = npp.preprocess_image(img, new_dim=256, crop=224)
    assert out.shape == (3, 224, 224)
    assert np.isfinite(out).all()
