"""Corpus manifest builder tests over synthetic on-disk layouts."""

import os

import numpy as np
import pytest

from xvector_tpu.data import corpora as C


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\0")


def test_make_speaker_tree(tmp_path):
    for spk in ("id001", "id002"):
        for i in range(3):
            _touch(str(tmp_path / spk / "sess" / f"utt{i}.wav"))
    dd = C.make_speaker_tree(str(tmp_path))
    assert len(dd) == 6
    assert dd.speakers == ["id001", "id002"]
    assert dd.utt2spk["id001-utt0"] == "id001"
    assert dd.wav["id002-utt2"].endswith("utt2.wav")


def test_make_musan(tmp_path):
    for cat in ("music", "noise", "speech"):
        for i in range(2):
            _touch(str(tmp_path / cat / "sub" / f"{cat}{i}.wav"))
    out = C.make_musan(str(tmp_path))
    assert set(out) == {"music", "noise", "speech"}
    dd = out["noise"]
    assert len(dd) == 2
    # utt == spk for augmentation sources
    for u, s in dd.utt2spk.items():
        assert u == s and u.startswith("noise-")


def test_make_rirs(tmp_path):
    for room in ("smallroom", "mediumroom"):
        for i in range(2):
            _touch(str(tmp_path / "simulated_rirs" / room / f"r{i}.wav"))
    rirs = C.make_rirs(str(tmp_path))
    assert set(rirs) == {"smallroom", "mediumroom"}
    assert len(rirs["smallroom"]) == 2


def test_make_sre16_eval(tmp_path):
    docs = tmp_path / "docs"
    os.makedirs(docs)
    (docs / "sre16_eval_enrollment.tsv").write_text(
        "modelid\tsegmentid\n1001\tsegA\n1001\tsegB\n1002\tsegC\n")
    (docs / "sre16_eval_segment_key.tsv").write_text(
        "segmentid\tsubjectid\nsegT1\ts77\nsegT2\ts88\n")
    for seg in ("segA", "segB", "segC"):
        _touch(str(tmp_path / "data" / "enrollment" / f"{seg}.sph"))
    for seg in ("segT1", "segT2"):
        _touch(str(tmp_path / "data" / "test" / f"{seg}.sph"))
    enroll, test = C.make_sre16_eval(str(tmp_path))
    assert len(enroll) == 3
    assert enroll.utt2spk["1001-segA"] == "1001"
    assert len(test) == 2
    assert test.utt2spk["segT1"] == "s77"


def test_make_sre16_unlabeled(tmp_path):
    for i in range(3):
        _touch(str(tmp_path / "data" / "unlabeled" / "major" / f"u{i}.sph"))
    dd = C.make_sre16_unlabeled(str(tmp_path))
    assert len(dd) == 3
    assert all(u == s for u, s in dd.utt2spk.items())


def test_make_sre18(tmp_path):
    docs = tmp_path / "docs"
    os.makedirs(docs)
    (docs / "sre18_dev_enrollment.tsv").write_text(
        "modelid\tsegmentid\tside\n"
        "m1\tsegA.sph\ta\nm1\tsegB.flac\ta\nm2\tsegC.sph\ta\n")
    (docs / "sre18_dev_trial_key.tsv").write_text(
        "modelid\tsegmentid\tside\ttargettype\n"
        "m1\tsegT1.sph\ta\ttarget\nm2\tsegT1.sph\ta\tnontarget\n")
    for seg, ext in (("segA", "sph"), ("segB", "flac"), ("segC", "wav")):
        _touch(str(tmp_path / "data" / "enrollment" / f"{seg}.{ext}"))
    _touch(str(tmp_path / "data" / "test" / "segT1.sph"))
    _touch(str(tmp_path / "data" / "unlabeled" / "segU1.sph"))
    out = C.make_sre18(str(tmp_path), "dev")
    enroll, test = out["enroll"], out["test"]
    assert len(enroll) == 3
    assert enroll.utt2spk["m1-segA"] == "m1"
    # flac routes through an ffmpeg decode pipe, sph stays a direct path
    assert enroll.wav["m1-segB"].startswith("ffmpeg")
    assert enroll.wav["m1-segB"].endswith("|")
    assert enroll.wav["m1-segA"].endswith("segA.sph")
    assert enroll.wav["m2-segC"].endswith("segC.wav")   # wav stays native
    assert test.utt2spk["segT1"] == "segT1"
    assert out["trials"] == [("m1", "segT1", 1), ("m2", "segT1", 0)]
    assert len(out["unlabeled"]) == 1


def test_load_trials(tmp_path):
    p = tmp_path / "trials"
    p.write_text("spk1 segA target\nspk1 segB nontarget\nspk2 segA target\n")
    trials = C.load_trials(str(p))
    assert trials == [("spk1", "segA", 1), ("spk1", "segB", 0),
                      ("spk2", "segA", 1)]


def test_datadir_algebra_roundtrip(tmp_path):
    """DataDir save/load + combine/split (utils/* parity)."""
    from xvector_tpu.io.datadir import DataDir, load_data_dir
    dd = DataDir(utt2spk={"a-1": "a", "a-2": "a", "b-1": "b"},
                 wav={"a-1": "x.wav", "a-2": "y.wav", "b-1": "z.wav"},
                 utt2num_frames={"a-1": 100, "a-2": 50, "b-1": 300})
    path = str(tmp_path / "dd")
    dd.save(path)
    back = load_data_dir(path)
    assert back.utt2spk == dd.utt2spk
    assert back.utt2num_frames == dd.utt2num_frames
    assert back.spk2utt == {"a": ["a-1", "a-2"], "b": ["b-1"]}
    shards = back.split(2)
    assert sum(len(s) for s in shards) == 3
    merged = shards[0].combine(shards[1])
    assert merged.utt2spk == dd.utt2spk
    assert back.filter_min_frames(80).utts == ["a-1", "b-1"]
    assert back.subset_speakers(2).speakers == ["a"]


def test_make_call_corpus(tmp_path):
    for fid in ("sw_10001", "sw_10002"):
        _touch(str(tmp_path / "audio" / f"{fid}.sph"))
    callers = [("sw_10001", "A", "spkX"), ("sw_10001", "B", "spkY"),
               ("sw_10002", "A", "spkX"), ("missing", "A", "spkZ")]
    dd = C.make_call_corpus(str(tmp_path / "audio"), callers)
    assert len(dd) == 3                      # missing file skipped
    assert dd.utt2spk["spkX-sw_10001-A"] == "spkX"
    assert dd.wav["spkY-sw_10001-B"].endswith("sw_10001.sph#ch1")
    path, ch = C.parse_channel_spec(dd.wav["spkY-sw_10001-B"])
    assert path.endswith(".sph") and ch == 1


def test_load_callers_csv(tmp_path):
    p = tmp_path / "callers.csv"
    p.write_text("file_id,channel,speaker\nsw1,A,s1\nsw1,B,s2\n")
    rows = C.load_callers_csv(str(p))
    assert rows == [("sw1", "A", "s1"), ("sw1", "B", "s2")]
    # tsv sniffing
    p2 = tmp_path / "callers.tsv"
    p2.write_text("file_id\tchannel\tspeaker\nsw9\tB\ts7\n")
    assert C.load_callers_csv(str(p2)) == [("sw9", "B", "s7")]


def test_load_wave_channel_suffix(tmp_path):
    import struct
    import numpy as np
    from xvector_tpu.io import wav as W
    a = np.arange(50, dtype=np.int16)
    b = -np.arange(50, dtype=np.int16)
    inter = np.empty(100, dtype=np.int16)
    inter[0::2], inter[1::2] = a, b
    hdr_lines = ["NIST_1A", "   1024", "channel_count -i 2",
                 "sample_rate -i 8000", "sample_n_bytes -i 2",
                 "sample_byte_format -s2 01", "sample_coding -s3 pcm",
                 "end_head"]
    header = "\n".join(hdr_lines).encode() + b"\n"
    header += b" " * (1024 - len(header) - 1) + b"\n"
    p = tmp_path / "c.sph"
    p.write_bytes(header + inter.tobytes())
    s1, _ = W.load_wave(str(p) + "#ch1")
    np.testing.assert_array_equal(s1, b.astype(np.float32))
