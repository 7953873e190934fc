"""Native libxta tests: parity with the Python kaldi_ark reader and the
Python materializer, including compressed matrices and fp16 rounding."""

import io
import os

import numpy as np
import pytest

from xvector_tpu.io import kaldi_ark as kio
from xvector_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libxta build unavailable")


def _write_ark(tmp_path, mats):
    ark, scp = str(tmp_path / "m.ark"), str(tmp_path / "m.scp")
    with kio.ArkWriter(ark, scp) as w:
        for k, m in mats.items():
            w.write(k, m)
    offsets = {}
    for line in open(scp):
        key, loc = line.split()
        path, off = loc.rsplit(":", 1)
        offsets[key] = (path, int(off))
    return offsets


def test_native_read_mat_parity(tmp_path):
    rng = np.random.RandomState(0)
    mats = {f"u{i}": rng.randn(10 + i, 23).astype(np.float32)
            for i in range(4)}
    offsets = _write_ark(tmp_path, mats)
    for k, (path, off) in offsets.items():
        got = native.read_mat(path, off)
        np.testing.assert_array_equal(got, mats[k])


def test_native_read_float64(tmp_path):
    m = np.random.RandomState(1).randn(6, 4)
    p = str(tmp_path / "d.ark")
    kio.write_mat(p, m, key="u")
    # offset of \0B == len("u ")
    got = native.read_mat(p, 2)
    np.testing.assert_allclose(got, m.astype(np.float32), rtol=1e-6)


def test_native_compressed_decode_parity(tmp_path):
    from tests.test_kaldi_io import _encode_cm1
    rng = np.random.RandomState(2)
    mat = (rng.randn(40, 6) * 2).astype(np.float32)
    payload = _encode_cm1(mat)
    p = str(tmp_path / "c.ark")
    with open(p, "wb") as f:
        f.write(b"u \x00B" + payload)
    got = native.read_mat(p, 2)
    want = kio._read_compressed_mat(io.BytesIO(payload[3:]), b"CM ")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_native_materialize_matches_python(tmp_path):
    rng = np.random.RandomState(3)
    mats = {f"u{i}": rng.randn(100, 8).astype(np.float32)
            for i in range(3)}
    offsets = _write_ark(tmp_path, mats)
    sources = []
    want = np.zeros((5, 32, 8), np.float16)
    for i in range(5):
        key = f"u{i % 3}"
        begin, length = 10 * i, 20 + i
        path, off = offsets[key]
        sources.append((path, off, begin, length))
        want[i, :length] = mats[key][begin: begin + length]
    got = native.materialize_chunks(sources, pad_len=32, feat_dim=8)
    assert got.dtype == np.float16
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), atol=1e-3)
    # fp16 conversion is round-to-nearest: max error bounded by half ulp
    assert np.abs(got.astype(np.float32)
                  - want.astype(np.float32)).max() <= 1e-3


def test_native_materialize_bad_range(tmp_path):
    mats = {"u0": np.random.RandomState(4).randn(10, 4)
            .astype(np.float32)}
    offsets = _write_ark(tmp_path, mats)
    path, off = offsets["u0"]
    with pytest.raises(IOError):
        native.materialize_chunks([(path, off, 5, 20)], pad_len=32,
                                  feat_dim=4)


def test_native_ark_stream_parity(tmp_path):
    """xta_stream_* yields the same (key, matrix) sequence as the Python
    read_mat_ark, including compressed entries."""
    rng = np.random.RandomState(0)
    ark = str(tmp_path / "s.ark")
    mats = {f"utt{i:03d}": rng.randn(20 + i, 13).astype(np.float32)
            for i in range(10)}
    with kio.ArkWriter(ark) as w:
        for i, (k, m) in enumerate(mats.items()):
            w.write(k, m)
    got = list(native.ArkStream(ark))
    want = list(kio.read_mat_ark(ark))
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, a), (_, b) in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_native_ark_stream_compressed(tmp_path):
    rng = np.random.RandomState(1)
    ark = str(tmp_path / "c.ark")
    with kio.ArkWriter(ark, compress=True) as w:
        w.write("a", rng.randn(50, 23).astype(np.float32))
        w.write("b", rng.randn(9, 23).astype(np.float32))
    got = dict(native.ArkStream(ark))
    want = dict(kio.read_mat_ark(ark))
    assert set(got) == {"a", "b"}
    for k in got:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6)


def test_read_mat_ark_fast_dispatch(tmp_path):
    """read_mat_ark_fast: native for plain files, fallback for pipes, and
    the ark: prefix is handled."""
    rng = np.random.RandomState(2)
    ark = str(tmp_path / "d.ark")
    with kio.ArkWriter(ark) as w:
        w.write("x", rng.randn(7, 5).astype(np.float32))
    for spec in (ark, f"ark:{ark}", f"cat {ark} |"):
        out = dict(kio.read_mat_ark_fast(spec))
        assert list(out) == ["x"] and out["x"].shape == (7, 5)


def test_native_ark_stream_malformed(tmp_path):
    bad = str(tmp_path / "bad.ark")
    with open(bad, "wb") as f:
        f.write(b"key notbinary")
    with pytest.raises(IOError):
        list(native.ArkStream(bad))


def test_native_cm2_parity(tmp_path):
    """CM2 (flat uint16) entries — what our own writer emits for ≤8-row
    matrices — decode natively via both read_mat and the stream."""
    rng = np.random.RandomState(5)
    ark = str(tmp_path / "cm2.ark")
    mats = {"short": rng.randn(5, 23).astype(np.float32),
            "tall": rng.randn(60, 23).astype(np.float32)}  # CM2 + CM mix
    with kio.ArkWriter(ark, compress=True) as w:
        for k, m in mats.items():
            w.write(k, m)
    want = dict(kio.read_mat_ark(ark))
    got_stream = dict(native.ArkStream(ark))
    assert set(got_stream) == set(mats)
    for k in mats:
        np.testing.assert_allclose(got_stream[k], want[k], atol=1e-6)
        # random-access path too
        np.testing.assert_allclose(
            native.read_mat(ark, _offset_of(ark, k)), want[k], atol=1e-6)


def _offset_of(ark, key):
    """Byte offset of the \\0B marker for ``key`` in a bare ark file."""
    data = open(ark, "rb").read()
    i = data.index(key.encode() + b" \x00B")
    return i + len(key) + 1


def test_native_mat_shape_header_only(tmp_path):
    """mat_shape reads dims for FM, DM, CM and CM2 without decoding."""
    rng = np.random.RandomState(6)
    plain = str(tmp_path / "p.ark")
    with kio.ArkWriter(plain) as w:
        w.write("f", rng.randn(17, 9).astype(np.float32))
    assert native.mat_shape(plain, _offset_of(plain, "f")) == (17, 9)
    comp = str(tmp_path / "c.ark")
    with kio.ArkWriter(comp, compress=True) as w:
        w.write("cm", rng.randn(33, 7).astype(np.float32))   # CM
        w.write("cm2", rng.randn(4, 7).astype(np.float32))   # CM2
    assert native.mat_shape(comp, _offset_of(comp, "cm")) == (33, 7)
    assert native.mat_shape(comp, _offset_of(comp, "cm2")) == (4, 7)
    dbl = str(tmp_path / "d.ark")
    kio.write_mat(dbl, rng.randn(6, 4), key="u")
    assert native.mat_shape(dbl, 2) == (6, 4)


def test_native_corrupt_dims_rejected(tmp_path):
    """Absurd dims in the header must return an error, not crash the
    process via a std::bad_alloc thrown across the C ABI."""
    import struct
    bad = str(tmp_path / "huge.ark")
    with open(bad, "wb") as f:
        f.write(b"u \x00BFM \x04" + struct.pack("<i", 1 << 30)
                + b"\x04" + struct.pack("<i", 1 << 30))
    with pytest.raises(IOError):
        native.read_mat(bad, 2)
    with pytest.raises(IOError):
        native.mat_shape(bad, 2)
    with pytest.raises(IOError):
        list(native.ArkStream(bad))
