"""Native caffemodel wire indexer (native/caffemodel.cpp) vs the pure-Python
decoder: identical records for everything our exporter and the reference's
released formats emit (modern + V1 layers, BlobShape + legacy dims, f32/f64
packed data)."""
import struct

import numpy as np
import pytest

from channel_pruning_tpu.io import caffemodel as cm
from channel_pruning_tpu.io import native_caffemodel as ncm

pytestmark = pytest.mark.skipif(not ncm.available(),
                                reason="libcp_native.so not built or stale")


def _python_load(path):
    """Force the pure-Python walk (bypasses the native fast path)."""
    from pathlib import Path
    raw = memoryview(Path(path).read_bytes())
    name = ""
    layers = []
    for fnum, wt, val in cm.iter_fields(raw):
        if fnum == 1 and wt == 2:
            name = bytes(val).decode()
        elif fnum == 100 and wt == 2:
            nm = lt = ""
            bl = []
            for f2, w2, v2 in cm.iter_fields(val):
                if f2 == 1 and w2 == 2:
                    nm = bytes(v2).decode()
                elif f2 == 2 and w2 == 2:
                    lt = bytes(v2).decode()
                elif f2 == 7 and w2 == 2:
                    bl.append(cm._decode_blob(v2))
            layers.append(cm.CaffeLayerBlobs(name=nm, type=lt, blobs=bl))
        elif fnum == 2 and wt == 2:
            nm, lt = "", ""
            bl = []
            for f2, w2, v2 in cm.iter_fields(val):
                if f2 == 4 and w2 == 2:
                    nm = bytes(v2).decode()
                elif f2 == 5 and w2 == 0:
                    lt = cm._V1_TYPES.get(v2, f"V1_{v2}")
                elif f2 == 6 and w2 == 2:
                    bl.append(cm._decode_blob(v2))
            layers.append(cm.CaffeLayerBlobs(name=nm, type=lt, blobs=bl))
    return name, layers


def _assert_same(a, b):
    (an, al), (bn, bl) = a, b
    assert an == bn
    assert len(al) == len(bl)
    for x, y in zip(al, bl):
        assert (x.name, x.type, len(x.blobs)) == (y.name, y.type, len(y.blobs))
        for u, v in zip(x.blobs, y.blobs):
            assert u.shape == v.shape
            np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_native_roundtrip_modern(tmp_path, rng):
    layers = [
        cm.CaffeLayerBlobs("convA", "Convolution",
                           [rng.normal(0, 1, (8, 3, 3, 3)).astype(np.float32),
                            rng.normal(0, 1, (8,)).astype(np.float32)]),
        cm.CaffeLayerBlobs("reluA", "ReLU", []),
        cm.CaffeLayerBlobs("fc", "InnerProduct",
                           [rng.normal(0, 1, (10, 72)).astype(np.float32)]),
    ]
    p = tmp_path / "m.caffemodel"
    cm.save_caffemodel(p, "testnet", layers)
    native = ncm.load_caffemodel_native(p)
    assert native is not None
    _assert_same(native, _python_load(p))


def test_native_legacy_v1_and_f64(tmp_path):
    """Hand-built wire bytes: V1 'layers' field (2), legacy num/c/h/w dims,
    packed double data — the released-2015-era caffemodel shape."""
    out = bytearray()
    cm._put_string(out, 1, "legacy_net")
    layer = bytearray()
    cm._put_string(layer, 4, "conv1")          # V1 name
    cm._tag(layer, 5, 0)
    cm._write_varint(layer, 4)                 # V1 enum: Convolution
    blob = bytearray()
    for f, v in ((1, 2), (2, 3), (3, 1), (4, 1)):   # legacy dims 2x3x1x1
        cm._tag(blob, f, 0)
        cm._write_varint(blob, v)
    data = np.arange(6, dtype="<f8")
    cm._tag(blob, 8, 2)                        # packed double_data (caffe.proto)
    cm._write_varint(blob, data.nbytes)
    blob += data.tobytes()
    diff = np.full(6, 99.0, dtype="<f8")
    cm._tag(blob, 9, 2)                        # packed double_diff: must skip
    cm._write_varint(blob, diff.nbytes)
    blob += diff.tobytes()
    cm._put_bytes(layer, 6, bytes(blob))       # V1 blobs field
    cm._put_bytes(out, 2, bytes(layer))        # legacy layers field
    p = tmp_path / "legacy.caffemodel"
    p.write_bytes(bytes(out))

    native = ncm.load_caffemodel_native(p)
    assert native is not None
    name, layers = native
    assert name == "legacy_net"
    assert layers[0].name == "conv1" and layers[0].type == "Convolution"
    assert layers[0].blobs[0].shape == (2, 3, 1, 1)
    assert layers[0].blobs[0].dtype == np.float32
    np.testing.assert_allclose(layers[0].blobs[0].ravel(),
                               np.arange(6, dtype=np.float32))
    _assert_same(native, _python_load(p))


def test_native_falls_back_on_unpacked_floats(tmp_path):
    """Unpacked repeated floats (wire type 5) are rare; the indexer must
    refuse them (return None) so the Python parser handles the file."""
    out = bytearray()
    layer = bytearray()
    cm._put_string(layer, 1, "c")
    cm._put_string(layer, 2, "Convolution")
    blob = bytearray()
    cm._tag(blob, 5, 5)                        # ONE unpacked float
    blob += struct.pack("<f", 1.5)
    cm._put_bytes(layer, 7, bytes(blob))
    cm._put_bytes(out, 100, bytes(layer))
    p = tmp_path / "unpacked.caffemodel"
    p.write_bytes(bytes(out))
    assert ncm.load_caffemodel_native(p) is None
    # the public loader still reads it via the fallback
    name, layers = cm.load_caffemodel(p)
    assert layers[0].blobs[0][0] == np.float32(1.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
