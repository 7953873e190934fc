"""shorten decoder tests: Python reference vs independent test encoder,
native C++ port parity, and embedded-shorten SPHERE end-to-end.

Covers SURVEY.md K1 (sph2pipe replacement): the reference recipe decodes
LDC SRE/SWBD audio via ``sph2pipe -f wav -p -c N`` pipes
(local/make_sre16_eval_BUT.pl:53 and 40+ sites) because those deliveries
are embedded-shorten SPHERE.  Here the framework decodes them natively.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import shorten_ref as enc  # noqa: E402

from xvector_tpu.io import shorten as dec  # noqa: E402
from xvector_tpu.io import wav as W  # noqa: E402
from xvector_tpu.runtime import native  # noqa: E402


def _ar_signal(rng, n, nchan, scale=300):
    x = np.cumsum(rng.integers(-scale, scale, size=(n, nchan)), axis=0)
    return np.clip(x, -32768, 32767).astype(np.int64)


@pytest.mark.parametrize("nmean", [0, 4])
@pytest.mark.parametrize("force", [None, enc.FN_DIFF0, enc.FN_DIFF1,
                                   enc.FN_DIFF2, enc.FN_DIFF3])
def test_diff_round_trip(nmean, force):
    rng = np.random.default_rng(0)
    x = _ar_signal(rng, 1000, 2)
    stream = enc.encode(x, blocksize=256, nmean=nmean, force_cmd=force)
    y, ftype, _ = dec.decode(stream)
    assert ftype == dec.TYPE_S16HL
    np.testing.assert_array_equal(y, x)


def test_qlpc_round_trip():
    rng = np.random.default_rng(1)
    x = _ar_signal(rng, 2000, 2)
    stream = enc.encode(x, blocksize=128, nmean=4,
                        qlpc_coeffs=[40, -20, 8])
    y, _, _ = dec.decode(stream)
    np.testing.assert_array_equal(y, x)


def test_zero_blocks_verbatim_and_tail_blocksize():
    rng = np.random.default_rng(2)
    z = np.zeros(777, np.int64)
    z[300:400] = rng.integers(-5000, 5000, 100)
    stream = enc.encode(z, blocksize=256, nmean=4, verbatim_head=b"hdr\x00")
    y, _, verbatim = dec.decode(stream)
    np.testing.assert_array_equal(y[:, 0], z)
    assert verbatim == [b"hdr\x00"]


def test_ulaw_byte_round_trip():
    rng = np.random.default_rng(3)
    u = rng.integers(0, 256, size=(500, 2)).astype(np.int64)
    stream = enc.encode(u, ftype=enc.TYPE_ULAW, blocksize=64, nmean=4)
    y, ftype, _ = dec.decode(stream)
    assert ftype == dec.TYPE_ULAW
    np.testing.assert_array_equal(y, u)


def test_max_samples_truncates():
    rng = np.random.default_rng(4)
    x = _ar_signal(rng, 1000, 1)
    stream = enc.encode(x, blocksize=256, nmean=0)
    y, _, _ = dec.decode(stream, max_samples=300)
    np.testing.assert_array_equal(y[:, 0], x[:300, 0])
    assert len(y) == 300


def test_corrupt_stream_raises():
    with pytest.raises(ValueError):
        dec.decode(b"nope" + b"\x00" * 64)
    rng = np.random.default_rng(5)
    x = _ar_signal(rng, 400, 1)
    stream = enc.encode(x, blocksize=256, nmean=0)
    with pytest.raises((ValueError, EOFError)):
        dec.decode(stream[: len(stream) // 2])  # truncated mid-block


@pytest.mark.skipif(not native.shorten_supported(),
                    reason="libxta shorten unavailable")
def test_native_matches_python():
    rng = np.random.default_rng(6)
    cases = []
    x = _ar_signal(rng, 5000, 2)
    cases.append(enc.encode(x, blocksize=256, nmean=4))
    cases.append(enc.encode(x, blocksize=256, nmean=0))
    cases.append(enc.encode(x, blocksize=128, nmean=4,
                            qlpc_coeffs=[40, -20, 8]))
    cases.append(enc.encode(x[:777, 0], blocksize=256, nmean=4))
    u = rng.integers(0, 256, size=(500, 2)).astype(np.int64)
    cases.append(enc.encode(u, ftype=enc.TYPE_ULAW, blocksize=64, nmean=4))
    for stream in cases:
        py, _, _ = dec.decode(stream)
        nat = native.shorten_decode(bytes(stream), py.shape[0])
        np.testing.assert_array_equal(nat, py.astype(np.int32))


def test_embedded_shorten_sphere_load_wave(tmp_path):
    rng = np.random.default_rng(7)
    x = _ar_signal(rng, 1500, 2)
    p = tmp_path / "call.sph"
    p.write_bytes(enc.sphere_with_shorten(x, sample_rate=8000))
    s0, rate = W.load_wave(str(p) + "#ch0")
    s1, _ = W.load_wave(str(p) + "#ch1")
    assert rate == 8000
    np.testing.assert_array_equal(s0.astype(np.int64), x[:, 0])
    np.testing.assert_array_equal(s1.astype(np.int64), x[:, 1])


def test_embedded_shorten_ulaw_sphere(tmp_path):
    rng = np.random.default_rng(8)
    u = rng.integers(0, 256, size=(800, 2)).astype(np.int64)
    p = tmp_path / "ulaw.sph"
    p.write_bytes(enc.sphere_with_shorten(u, sample_rate=8000, ulaw=True))
    s1, rate = W.load_wave(str(p) + "#ch1")
    ref = W._mulaw_decode(u[:, 1].astype(np.uint8))
    assert rate == 8000
    np.testing.assert_array_equal(s1, ref)


def test_sphere_sample_count_bounds_padded_stream(tmp_path):
    # encoders pad the final block; sample_count in the SPHERE header wins
    rng = np.random.default_rng(9)
    x = _ar_signal(rng, 700, 1)
    padded = np.concatenate([x, np.zeros((68, 1), np.int64)])
    stream = enc.encode(padded, blocksize=256, nmean=4)
    coding = "pcm,embedded-shorten-v2.00"
    head = ("NIST_1A\n   1024\n"
            "sample_count -i 700\nchannel_count -i 1\n"
            "sample_rate -i 8000\nsample_n_bytes -i 2\n"
            "sample_byte_format -s2 10\n"
            f"sample_coding -s{len(coding)} {coding}\nend_head\n")
    p = tmp_path / "padded.sph"
    p.write_bytes(head.encode().ljust(1024, b" ") + stream)
    s, _ = W.load_wave(str(p))
    assert len(s) == 700
    np.testing.assert_array_equal(s.astype(np.int64), x[:, 0])


def test_fuzz_truncated_and_mutated_streams_never_crash():
    """Robustness on untrusted input: truncations and random byte flips
    of valid streams must raise cleanly (Python) / return an error or
    bounded output (native) — never hang, crash, or scribble memory."""
    rng = np.random.default_rng(42)
    x = _ar_signal(rng, 2000, 2)
    stream = bytearray(enc.encode(x, blocksize=256, nmean=4))
    cases = []
    for cut in (5, 6, 20, len(stream) // 2, len(stream) - 3):
        cases.append(bytes(stream[:cut]))
    for _ in range(40):
        mut = bytearray(stream)
        for _ in range(rng.integers(1, 8)):
            mut[rng.integers(5, len(mut))] = rng.integers(0, 256)
        cases.append(bytes(mut))
    for _ in range(10):
        cases.append(b"ajkg\x02" + rng.bytes(rng.integers(4, 200)))
    for payload in cases:
        try:
            out, _, _ = dec.decode(payload, max_samples=4000)
            assert out.shape[0] <= 4000
        except (ValueError, EOFError, OverflowError, MemoryError):
            pass
        if native.shorten_supported():
            try:
                out = native.shorten_decode(payload, 4000)
                assert out.shape[0] <= 4000
            except ValueError:
                pass


def test_fuzz_random_garbage_rejected():
    rng = np.random.default_rng(7)
    for _ in range(25):
        blob = rng.bytes(rng.integers(0, 64))
        with pytest.raises((ValueError, EOFError)):
            dec.decode(blob)
        if native.shorten_supported():
            with pytest.raises((ValueError,)):
                native.shorten_decode(blob, 100)


def test_qlpc_order_above_declared_maxnlpc():
    """A stream may declare maxnlpc smaller than a block's actual LPC
    order (still within the NWRAP=3 history floor).  Both decoders must
    handle it without memory corruption and agree bit-exactly — the C++
    port used to size its coefficient buffer from the header's maxnlpc
    and write past it."""
    rng = np.random.default_rng(11)
    x = _ar_signal(rng, 1500, 1)
    stream = enc.encode(x, blocksize=128, nmean=4,
                        qlpc_coeffs=[40, -20, 8], declare_maxnlpc=2)
    y, _, _ = dec.decode(stream)
    np.testing.assert_array_equal(y[:, 0], x[:, 0])
    if native.shorten_supported():
        nat = native.shorten_decode(bytes(stream), len(x))
        np.testing.assert_array_equal(nat[:, 0], x[:, 0].astype(np.int32))


@pytest.mark.skipif(not native.shorten_supported(),
                    reason="libxta shorten unavailable")
def test_native_unknown_length_grows_past_initial_capacity():
    """sample_count=None: FN_ZERO blocks compress far below 1 bit/sample,
    so the native wrapper must grow its buffer and redecode instead of
    silently truncating (the Python reference is the oracle)."""
    z = np.zeros(400_000, np.int64)      # ~3 bits per 256-sample block
    stream = enc.encode(z, blocksize=256, nmean=0)
    assert len(stream) * 8 < len(z)      # the old bound WOULD truncate
    out = native.shorten_decode(bytes(stream), None)
    assert out.shape[0] == len(z)
    assert not out.any()


def test_read_wav_scp_resamples_to_target(tmp_path):
    """wav.scp entries at a different stored rate are resampled to the
    front-end's rate instead of being silently misinterpreted."""
    import struct
    from xvector_tpu.extract.extractor import read_wav_scp

    sr_in = 16000
    t = np.arange(sr_in) / sr_in
    tone = (8000 * np.sin(2 * np.pi * 440 * t)).astype("<i2")
    data = tone.tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_in,
                                   sr_in * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    (tmp_path / "a16k.wav").write_bytes(wav)
    (tmp_path / "wav.scp").write_text(f"u0 {tmp_path}/a16k.wav\n")
    utt, samples = next(read_wav_scp(str(tmp_path / "wav.scp"),
                                     target_sr=8000))
    assert utt == "u0"
    assert abs(len(samples) - 8000) <= 1
    # 440 Hz tone must survive at the new rate
    t8 = np.arange(len(samples)) / 8000
    ref = np.sin(2 * np.pi * 440 * t8)
    core = slice(300, -300)
    corr = np.corrcoef(samples[core], ref[core])[0, 1]
    assert abs(corr) > 0.99
