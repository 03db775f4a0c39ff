"""Caffe interop: prototxt/caffemodel roundtrips + golden parses of the
reference's released prototxts (structure-level parity, SURVEY.md §4)."""
from pathlib import Path

import numpy as np
import pytest

from channel_pruning_tpu.graph.ir import LT, shapes_of
from channel_pruning_tpu.io import caffe as cio
from channel_pruning_tpu.io import caffemodel as cm
from channel_pruning_tpu.io import prototxt as pt
from channel_pruning_tpu.models.vgg import (VGG16_5X_CHANNELS, build_vgg16,
                                            build_tiny_vgg)
from channel_pruning_tpu.models.resnet import build_resnet50

REF = Path("/root/reference")


def test_prototxt_parse_basics():
    msg = pt.parse('''
    name: "x"
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "c" type: "Convolution" bottom: "data" top: "c"
            convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
    layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
    ''')
    assert msg["name"] == "x"
    assert [int(d) for d in msg["input_dim"]] == [1, 3, 8, 8]
    assert len(msg["layer"]) == 2
    assert msg["layer"][0]["convolution_param"]["num_output"] == 4


def test_prototxt_roundtrip_graph():
    g = build_vgg16(batch=2, image_size=224)
    text = cio.export_prototxt(g)
    g2 = cio.import_prototxt(text, batch=2)
    assert g2.convs == g.convs
    assert g2.fcs == g.fcs
    s1, s2 = shapes_of(g), shapes_of(g2)
    for c in g.convs:
        assert s1[g.layer(c).tops[0]] == s2[g2.layer(c).tops[0]]


def test_prototxt_roundtrip_floor_pooling():
    """PoolingParameter.round_mode must survive export/import: Xception's
    strided blocks pool with FLOOR (ceil_mode=False) and the eltwise join
    shape-mismatches if the reimported pool silently reverts to Caffe's
    CEIL default (found by the round-4 xception recovery chain)."""
    from channel_pruning_tpu.models.xception import build_tiny_xception

    g, _ = build_tiny_xception(batch=2, image_size=32)
    g2 = cio.import_prototxt(cio.export_prototxt(g), batch=2)
    pools = [l for l in g.layers if l.type == "Pooling" and not
             l.attr("global_pooling", False)]
    assert any(not l.attr("ceil_mode", True) for l in pools)
    for l in pools:
        assert g2.layer(l.name).attr("ceil_mode", True) == \
            l.attr("ceil_mode", True), l.name
    # and the reimported graph still shape-checks through the eltwise joins
    s1, s2 = shapes_of(g), shapes_of(g2)
    assert s1 == s2


def test_caffemodel_roundtrip(tmp_path):
    g, params = build_tiny_vgg(batch=2, image_size=16)
    path = tmp_path / "m.caffemodel"
    cio.save_weights(g, params, path)
    g2, back = cio.load_weights(g, path)
    assert set(back) == {k for k, v in params.items() if v}
    for k in back:
        np.testing.assert_array_equal(back[k]["W"], params[k]["W"])
        if "b" in params[k]:
            np.testing.assert_array_equal(back[k]["b"], params[k]["b"])


def test_caffemodel_roundtrip_device_params(tmp_path):
    """save_weights on DEVICE-resident params: the batched jax.device_get
    fetch path (one async d2h per tree, not one blocking fetch per layer)
    must produce a byte-identical artifact to the host-array path."""
    import jax

    g, params = build_tiny_vgg(batch=2, image_size=16)
    cio.save_weights(g, params, tmp_path / "host.caffemodel")
    dev = jax.tree_util.tree_map(jax.numpy.asarray, params)
    cio.save_weights(g, dev, tmp_path / "dev.caffemodel")
    assert (tmp_path / "host.caffemodel").read_bytes() == \
           (tmp_path / "dev.caffemodel").read_bytes()


def test_encode_blob_chunks_edge_shapes():
    """Zero-copy memoryview encoding must handle 0-d, empty, and
    non-contiguous/f64 blobs (BN factor scalars, transposed views)."""
    for arr in [np.float32(3.5).reshape(()), np.zeros((0,), np.float32),
                np.arange(12, dtype=np.float64).reshape(3, 4).T,
                np.ones((5,), np.float32)[::2]]:
        chunks = cm._encode_blob_chunks(np.asarray(arr))
        blob = b"".join(bytes(c) for c in chunks)
        back = cm._decode_blob(memoryview(blob))
        np.testing.assert_array_equal(back, np.asarray(arr, np.float32))


def test_caffemodel_wire_blob_legacy_dims(tmp_path):
    """Blobs carrying only legacy num/channels/height/width dims (pre-
    BlobShape caffemodels) must decode with the right shape."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    blob = bytearray()
    for fnum, v in ((1, 2), (2, 3), (3, 2), (4, 2)):
        cm._tag(blob, fnum, 0)
        cm._write_varint(blob, v)
    cm._put_bytes(blob, 5, data.tobytes())
    lp = bytearray()
    cm._put_string(lp, 1, "conv")
    cm._put_string(lp, 2, "Convolution")
    cm._put_bytes(lp, 7, bytes(blob))
    out = bytearray()
    cm._put_string(out, 1, "legacy_net")
    cm._put_bytes(out, 100, bytes(lp))
    p = tmp_path / "legacy.caffemodel"
    p.write_bytes(bytes(out))
    name, layers = cm.load_caffemodel(p)
    assert name == "legacy_net"
    assert layers[0].name == "conv"
    np.testing.assert_array_equal(layers[0].blobs[0], data)


def test_full_model_export_import_forward(tmp_path):
    """Export a pruned-ish tiny net, reimport, verify identical forward."""
    from channel_pruning_tpu.ops.forward import build_forward, to_device_params

    g, params = build_tiny_vgg(batch=2, image_size=16)
    cio.export_model(g, params, tmp_path / "net.prototxt",
                     tmp_path / "net.caffemodel")
    g2, p2 = cio.import_model(tmp_path / "net.prototxt",
                              tmp_path / "net.caffemodel", batch=2)
    x = np.random.default_rng(0).normal(0, 1, (2, 3, 16, 16)).astype(np.float32)
    o1, _ = build_forward(g, jit=False)(to_device_params(params), {"data": x})
    o2, _ = build_forward(g2, jit=False)(to_device_params(p2), {"data": x})
    np.testing.assert_allclose(np.asarray(o1["prob"]), np.asarray(o2["prob"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_golden_parse_reference_vgg():
    g = cio.import_prototxt_file(REF / "temp/vgg.prototxt", batch=10)
    assert len(g.convs) == 13
    assert len(g.fcs) == 3
    shapes = shapes_of(g)
    assert shapes[g.layer("conv5_3").tops[0]] == (10, 512, 14, 14)
    assert shapes[g.layer("fc8").tops[0]][1] == 1000
    # structure matches our builder layer-for-layer
    ours = build_vgg16(batch=10)
    assert g.convs == ours.convs


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_golden_parse_released_5x_channels():
    g = cio.import_prototxt_file(REF / "temp/channel_pruning.prototxt", batch=10)
    got = {c: int(g.layer(c).attr("num_output")) for c in g.convs}
    for conv, want in VGG16_5X_CHANNELS.items():
        assert got[conv] == want, (conv, got[conv], want)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_golden_parse_reference_resnet_cp():
    g = cio.import_prototxt_file(REF / "temp/resnet-50-cp.prototxt", batch=10)
    assert len(g.by_type(LT.SELECT)) >= 10   # the fork's Filter layers
    assert len(g.by_type(LT.BN)) >= 50
    shapes = shapes_of(g)
    # standard ResNet-50 stage shapes survive the pruned import
    assert shapes[g.layer("fc1000").tops[0]][1] == 1000


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_golden_roundtrip_released_prototxts():
    """import -> export -> reimport must preserve structure and conv
    attributes for every released prototxt in the reference's temp/."""
    for name in ("vgg.prototxt", "channel_pruning.prototxt",
                 "resnet-50-cp.prototxt"):
        g1 = cio.import_prototxt_file(REF / "temp" / name, batch=4)
        g2 = cio.import_prototxt(cio.export_prototxt(g1), batch=4)
        assert g1.convs == g2.convs, name
        for c in g1.convs:
            a1, a2 = g1.layer(c).conv_geometry(), g2.layer(c).conv_geometry()
            assert a1 == a2, (name, c)
            assert g1.layer(c).attr("num_output") == g2.layer(c).attr("num_output")
        s1, s2 = shapes_of(g1), shapes_of(g2)
        for c in g1.convs:
            assert s1[g1.layer(c).tops[0]] == s2[g2.layer(c).tops[0]]


def test_deploy_export_roundtrip(tmp_path):
    """Serialized StableHLO forward reloads and matches the live forward."""
    from channel_pruning_tpu import deploy
    from channel_pruning_tpu.models.vgg import build_tiny_vgg
    from channel_pruning_tpu.ops.forward import build_forward, to_device_params

    g, params = build_tiny_vgg(batch=2, image_size=16)
    p = tmp_path / "net.stablehlo"
    deploy.export_serialized(g, params, p, batch=2)
    fn = deploy.load_serialized(p)
    x = np.random.default_rng(0).normal(0, 1, (2, 3, 16, 16)).astype(np.float32)
    got = np.asarray(fn(x))
    outs, _ = build_forward(g, jit=False)(to_device_params(params), {"data": x})
    np.testing.assert_allclose(got, np.asarray(outs["prob"]), rtol=1e-5,
                               atol=1e-6)


def test_export_with_imagedata_layer():
    g = build_tiny_vgg(batch=4, image_size=16)[0]
    text = cio.export_prototxt(g, data_layer={"source": "val.txt",
                                              "batch_size": 10,
                                              "new_dim": 256,
                                              "mean_file": "bgr.binaryproto"})
    msg = pt.parse(text)
    first = pt.as_list(msg["layer"])[0]
    assert first["type"] == "ImageData"
    assert first["image_data_param"]["bicubic"] is True
    assert first["transform_param"]["mean_file"] == "bgr.binaryproto"
    # still importable (data layer becomes the input spec)
    g2 = cio.import_prototxt(text, batch=4, default_image=16)
    assert g2.convs == g.convs


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_band_check_tool_on_released_artifacts(capsys):
    """tools/band_check.py verifies BOTH released structures: exact VGG 5x
    widths (temp/channel_pruning.prototxt) and in-band ResNet 2x widths +
    16 Filter gates (temp/resnet-50-cp.prototxt)."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    band_check = importlib.import_module("band_check")
    for proto, needle in [
            ("temp/channel_pruning.prototxt", "13/13"),
            ("temp/resnet-50-cp.prototxt", "32/32")]:
        _sys.argv = ["band_check", str(REF / proto)]
        assert band_check.main() == 0
        assert needle in capsys.readouterr().out
