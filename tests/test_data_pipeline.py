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


BGR_BINARYPROTO = "/root/reference/temp/bgr.binaryproto"


@pytest.mark.skipif(not __import__("os").path.exists(BGR_BINARYPROTO),
                    reason="reference mean file not present")
def test_bgr_binaryproto_external_golden():
    """Decode the one real Caffe binary artifact available — the reference's
    ImageNet BGR mean file (consumed at lib/net.py:812) — through the
    from-scratch BlobProto wire codec. External (non-self-referential)
    validation: the decoded per-channel means must match the published
    ILSVRC BGR mean pixel to ~1/255."""
    from channel_pruning_tpu.data.pipeline import load_binaryproto_mean

    m = load_binaryproto_mean(BGR_BINARYPROTO)
    assert m.shape == (3, 224, 224)
    ch = m.mean(axis=(1, 2))
    np.testing.assert_allclose(ch, BGR_MEAN, atol=1.0)
    assert 90 < m.min() and m.max() < 135  # a mean image, not noise
    # crop path used by verify-release
    c = load_binaryproto_mean(BGR_BINARYPROTO, crop=128)
    assert c.shape == (3, 128, 128)
    np.testing.assert_allclose(c, m[:, 48:176, 48:176])


def test_preprocess_bicubic_matches_pil_float():
    """External cross-validation of the device resize kernel: on upsample,
    jax.image bicubic (antialias=False, Keys a=-0.5) must bit-match PIL's
    float bicubic (PIL only prefilters on downsample). Run per-channel in
    PIL 'F' mode — uint8-mode PIL output rounds/clamps and masks the
    comparison."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.float32)
    pil = np.stack([np.asarray(Image.fromarray(img[:, :, c], mode="F")
                               .resize((128, 128), Image.BICUBIC))
                    for c in range(3)], -1)
    jx = np.asarray(jax.image.resize(jnp.asarray(img), (128, 128, 3),
                                     method="bicubic", antialias=False))
    np.testing.assert_allclose(jx, pil, atol=1e-3)


def test_preprocess_full_chain_matches_pil_reference():
    """The whole `preprocess` (shorter-side bicubic resize -> center crop ->
    BGR -> mean subtract -> CHW) against an independent PIL+numpy
    reimplementation on an upsampling path."""
    import jax.numpy as jnp

    from channel_pruning_tpu.data.pipeline import preprocess

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (48, 72, 3)).astype(np.uint8)
    got = np.asarray(preprocess(jnp.asarray(img), new_dim=96, crop=80))

    nh, nw = 96, int(round(72 * 96 / 48))
    ref = np.stack([np.asarray(Image.fromarray(img[:, :, c].astype(np.float32),
                                               mode="F").resize((nw, nh),
                                                                Image.BICUBIC))
                    for c in range(3)], -1)
    y0, x0 = (nh - 80) // 2, (nw - 80) // 2
    ref = ref[y0:y0 + 80, x0:x0 + 80, ::-1] - BGR_MEAN
    ref = np.transpose(ref, (2, 0, 1))
    np.testing.assert_allclose(got, ref, atol=1e-2)
