"""From-scratch LMDB + Caffe Datum codec (reference Data-layer source,
lib/net.py:813-822). No liblmdb exists in this environment, so these tests
validate the reader against the writer plus struct-level invariants of the
published format (magic, metas, page/node layout, overflow chains)."""
import numpy as np
import pytest

from channel_pruning_tpu.data.lmdb import (
    LMDBReader, Datum, decode_datum, encode_datum, lmdb_batches, write_lmdb,
    MDB_MAGIC, PAGESIZE)


def _items(n, vsize=32, seed=0):
    rng = np.random.default_rng(seed)
    return [(b"%08d" % i, rng.integers(0, 256, vsize, np.uint8).tobytes())
            for i in range(n)]


def test_roundtrip_small(tmp_path):
    items = _items(10)
    write_lmdb(tmp_path / "db", items)
    with LMDBReader(tmp_path / "db") as rd:
        assert len(rd) == 10
        got = list(rd.items())
    assert got == items


def test_roundtrip_multipage_and_overflow(tmp_path):
    # values big enough to force overflow pages, plus many small entries
    # to force branch pages (multi-level tree)
    items = _items(600, vsize=64) + [
        (b"big%05d" % i, bytes(range(256)) * 40) for i in range(8)  # 10KB
    ]
    write_lmdb(tmp_path / "db", items)
    with LMDBReader(tmp_path / "db") as rd:
        assert rd.depth >= 2          # at least one branch level
        got = dict(rd.items())
    want = dict(items)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], k


def test_meta_layout(tmp_path):
    """Struct-level pinning: both metas present, magic/version, page size,
    meta 1 carries the committed txn."""
    import struct
    write_lmdb(tmp_path / "db", _items(3))
    raw = (tmp_path / "db" / "data.mdb").read_bytes()
    assert len(raw) % PAGESIZE == 0
    for off in (16, PAGESIZE + 16):
        magic, version = struct.unpack_from("<II", raw, off)
        assert magic == MDB_MAGIC and version == 1
        (psize,) = struct.unpack_from("<I", raw, off + 24)
        assert psize == PAGESIZE
    txn0 = struct.unpack_from("<Q", raw, 16 + 24 + 96 + 8)[0]
    txn1 = struct.unpack_from("<Q", raw, PAGESIZE + 16 + 24 + 96 + 8)[0]
    assert (txn0, txn1) == (0, 1)


def test_empty_db(tmp_path):
    write_lmdb(tmp_path / "db", [])
    with LMDBReader(tmp_path / "db") as rd:
        assert len(rd) == 0
        assert list(rd.items()) == []


def test_datum_codec_raw():
    arr = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
    d = Datum(channels=3, height=4, width=5, data=arr.tobytes(), label=7)
    d2 = decode_datum(encode_datum(d))
    assert (d2.channels, d2.height, d2.width, d2.label) == (3, 4, 5, 7)
    np.testing.assert_array_equal(d2.to_array(), arr.astype(np.float32))


def test_datum_codec_float_and_default_label():
    d = Datum(channels=1, height=2, width=2,
              float_data=[1.5, -2.0, 0.0, 3.25])
    d2 = decode_datum(encode_datum(d))
    assert d2.label == -1                     # field omitted -> default
    np.testing.assert_allclose(
        d2.to_array(), np.array([[[1.5, -2.0], [0.0, 3.25]]], np.float32))


def test_lmdb_batches_center_crop(tmp_path):
    """Data-layer semantics: 8x8 raw datums, crop 4, BGR pixel mean."""
    rng = np.random.default_rng(0)
    items = []
    raws = []
    for i in range(6):
        arr = rng.integers(0, 256, (3, 8, 8), np.uint8)
        raws.append(arr)
        d = Datum(channels=3, height=8, width=8, data=arr.tobytes(), label=i)
        items.append((b"%08d" % i, encode_datum(d)))
    write_lmdb(tmp_path / "db", items)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    batches = list(lmdb_batches(tmp_path / "db", 4, crop=4, mean=mean))
    assert [b[0].shape for b in batches] == [(4, 3, 4, 4), (2, 3, 4, 4)]
    assert batches[0][1].tolist() == [0, 1, 2, 3]
    want = raws[0][:, 2:6, 2:6].astype(np.float32) - mean[:, None, None]
    np.testing.assert_allclose(batches[0][0][0], want)


def test_cli_eval_over_lmdb(tmp_path):
    """The Data-layer chain end-to-end: cmd_eval sources batches from an
    LMDB of raw Datums (reference `caffe test` with an lmdb Data layer)."""
    from channel_pruning_tpu import cli

    rng = np.random.default_rng(0)
    items = []
    for i in range(8):
        arr = rng.integers(0, 256, (3, 16, 16), np.uint8)
        d = Datum(channels=3, height=16, width=16, data=arr.tobytes(),
                  label=i % 10)
        items.append((b"%08d" % i, encode_datum(d)))
    write_lmdb(tmp_path / "db", items)
    res = cli.main(["eval", "--model", "tiny_vgg", "--batch", "4",
                    "--data-dir", str(tmp_path / "db"),
                    "--eval-batches", "2", "--work-dir", str(tmp_path)])
    assert "top1" in res or "accuracy@1" in res or res  # finite metrics dict
    for v in res.values():
        assert np.isfinite(v)


def test_lmdb_batches_encoded(tmp_path):
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)   # HWC RGB
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    d = Datum(data=buf.getvalue(), label=3, encoded=True)
    write_lmdb(tmp_path / "db", [(b"0", encode_datum(d))])
    (imgs, labels), = lmdb_batches(tmp_path / "db", 1, new_dim=16, crop=8)
    assert imgs.shape == (1, 3, 8, 8) and labels[0] == 3
    assert np.isfinite(imgs).all()


def _raw_datum_db(tmp_path, n, hw=8, name="db", seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        arr = rng.integers(0, 256, (3, hw, hw), np.uint8)
        d = Datum(channels=3, height=hw, width=hw, data=arr.tobytes(),
                  label=i)
        items.append((b"%08d" % i, encode_datum(d)))
    write_lmdb(tmp_path / name, items)
    return tmp_path / name


def test_lmdb_batches_shuffle_covers_epoch_deterministically(tmp_path):
    """shuffle=True must (a) visit every record exactly once per epoch,
    (b) reorder vs key order, (c) be reproducible for a given seed —
    this is what makes a class-sorted convert_imageset LMDB safe for
    calibration (the reference shuffles at the cursor, lib/net.py:813-822)."""
    db = _raw_datum_db(tmp_path, 64)
    def epoch(seed):
        labels = []
        for _, y in lmdb_batches(db, 16, crop=4, shuffle=True, seed=seed):
            labels.extend(y.tolist())
        return labels
    a, b, c = epoch(1), epoch(1), epoch(2)
    assert sorted(a) == list(range(64))     # full coverage, no dup/drop
    assert a == b                           # seed-deterministic
    assert a != list(range(64))             # actually shuffled
    assert c != a                           # seed changes the order


def test_lmdb_batches_loop_carries_partial_batches(tmp_path):
    """loop=True: tail records (n % batch != 0) must carry into the next
    epoch's first batch, never be silently dropped (ADVICE r2)."""
    db = _raw_datum_db(tmp_path, 5)
    gen = lmdb_batches(db, 4, crop=4, loop=True)
    seen = []
    for _ in range(5):                       # 20 records = 4 epochs of 5
        x, y = next(gen)
        assert x.shape[0] == 4
        seen.extend(y.tolist())
    assert sorted(seen) == sorted(list(range(5)) * 4)


def test_lmdb_batches_random_crop_and_mirror_raw(tmp_path):
    """TRAIN-phase transform on raw datums: every output must be SOME
    (possibly mirrored) crop window of the source, and offsets must vary."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (3, 8, 8), np.uint8)
    d = Datum(channels=3, height=8, width=8, data=arr.tobytes(), label=0)
    write_lmdb(tmp_path / "db", [(b"0", encode_datum(d))] * 1)
    crops = set()
    for seed in range(12):
        (x, _), = lmdb_batches(tmp_path / "db", 1, crop=4,
                               mean=np.zeros(3, np.float32),
                               random_crop=True, seed=seed)
        got = x[0]
        match = None
        for y0 in range(5):
            for x0 in range(5):
                win = arr[:, y0:y0 + 4, x0:x0 + 4].astype(np.float32)
                if np.array_equal(got, win):
                    match = (y0, x0, False)
                if np.array_equal(got, win[:, :, ::-1]):
                    match = (y0, x0, True)
        assert match is not None, f"seed {seed}: not a crop/mirror window"
        crops.add(match)
    assert len(crops) > 1                    # offsets/mirror actually vary


def test_lmdb_batches_random_crop_encoded(tmp_path):
    """TRAIN-phase transform on encoded datums: random_crop must vary the
    crop window (pre-fix it silently center-cropped every epoch)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 24, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    d = Datum(data=buf.getvalue(), label=0, encoded=True)
    write_lmdb(tmp_path / "db", [(b"0", encode_datum(d))])
    outs = []
    for seed in range(8):
        (x, _), = lmdb_batches(tmp_path / "db", 1, new_dim=16, crop=8,
                               random_crop=True, seed=seed)
        outs.append(x[0])
    distinct = {o.tobytes() for o in outs}
    assert len(distinct) > 1                 # crop offset actually varies
    (center, _), = lmdb_batches(tmp_path / "db", 1, new_dim=16, crop=8)
    assert any(not np.array_equal(o, center[0]) for o in outs)


def test_lmdb_batches_branch_page_tree_streaming_vs_shuffled(tmp_path):
    """A DB deep enough to hold branch pages (depth >= 2) must stream the
    SAME record set through the sequential cursor walk and the shuffled
    leaf_refs random-access path (pins the child-pgno reconstruction,
    lo | hi<<16 | nflags<<32)."""
    db = _raw_datum_db(tmp_path, 400, hw=4)
    with LMDBReader(db) as rd:
        assert rd.depth >= 2
    seq = []
    for _, y in lmdb_batches(db, 32, crop=4):
        seq.extend(y.tolist())
    shuf = []
    for _, y in lmdb_batches(db, 32, crop=4, shuffle=True, seed=7):
        shuf.extend(y.tolist())
    assert seq == list(range(400))           # cursor walk is key-ordered
    assert sorted(shuf) == list(range(400))  # random access sees all leaves
