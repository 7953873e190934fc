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


def test_make_swbd_cellular(tmp_path):
    for conv in ("40000", "40019", "40021"):
        _touch(str(tmp_path / "data" / "audio" / f"sw_{conv}.sph"))
    os.makedirs(tmp_path / "doc")
    (tmp_path / "doc" / "swb_callstats.tbl").write_text(
        "40000,1001,1002,M,F\n"
        "40019,1003,1004,M,M\n"        # bad audio in part 1
        "40021,1001,1005,M,F\n"
        "40099,1006,1007,F,F\n")       # sph missing
    dd = C.make_swbd_cellular(str(tmp_path), version=1)
    assert len(dd) == 4                # 2 convs × 2 sides
    assert dd.utt2spk["sw_1001-swbdc_sw_40000_1"] == "sw_1001"
    assert dd.wav["sw_1002-swbdc_sw_40000_2"].endswith("sw_40000.sph#ch1")
    assert dd.spk2gender == {"sw_1001": "m", "sw_1002": "f", "sw_1005": "f"}
    # part 2: docs/ directory and a different bad-audio list
    os.makedirs(tmp_path / "docs")
    os.rename(tmp_path / "doc" / "swb_callstats.tbl",
              tmp_path / "docs" / "swb_callstats.tbl")
    dd2 = C.make_swbd_cellular(str(tmp_path), version=2)
    assert len(dd2) == 6               # 40019 allowed in part 2
    assert "sw_1003-swbdc_sw_40019_1" in dd2.utt2spk


def test_make_swbd2_phases(tmp_path):
    def layout(base, doc_name, callstat, callinfo=None):
        root = tmp_path / base
        for fid in ("sw_2001", "sw_2002"):
            _touch(str(root / "data" / "audio" / f"{fid}.sph"))
        os.makedirs(root / doc_name)
        (root / doc_name / "callstat.tbl").write_text(callstat)
        if callinfo is not None:
            (root / doc_name / "callinfo.tbl").write_text(callinfo)
        return str(root)

    # phase 1: file id in col 0 (with extension), genders in cols 5/6
    r1 = layout("p1", "doc",
                "sw_2001.sph,x,301,302,x,M,F\n"
                "sw_2002.sph,x,303,304,x,F,M\n")
    d1 = C.make_swbd2_phase(r1, 1)
    assert len(d1) == 4
    assert d1.utt2spk["sw_301_sw_2001_1"] == "sw_301"
    assert d1.wav["sw_302_sw_2001_2"].endswith("sw_2001.sph#ch1")
    assert d1.spk2gender["sw_304"] == "m"

    # phase 2: file ids live in callinfo.tbl (2 rows per call)
    r2 = layout("p2", "doc",
                "x,x,311,312,M,F\n"
                "x,x,313,314,F,M\n",
                callinfo=("sw_2001,a\nsw_2001,b\n"
                          "sw_2002,a\nsw_2002,b\n"))
    d2 = C.make_swbd2_phase(r2, 2)
    assert len(d2) == 4
    assert d2.utt2spk["sw_311_sw_2001_1"] == "sw_311"
    assert d2.spk2gender["sw_312"] == "f"

    # phase 3: docs/, bare conv number in col 0, speakers in cols 3/4
    r3 = layout("p3", "docs",
                "2001,x,x,321,322,M,F\n"
                "2002,x,x,323,324,F,M\n")
    d3 = C.make_swbd2_phase(r3, 3)
    assert len(d3) == 4
    assert d3.utt2spk["sw_321_sw_2001_1"] == "sw_321"
    assert d3.wav["sw_324_sw_2002_2"].endswith("sw_2002.sph#ch1")


def _mx6_layout(tmp_path):
    docs = tmp_path / "docs"
    os.makedirs(docs, exist_ok=True)
    (docs / "mx6_subjs.csv").write_text(
        "subjid,sex\n9001,M\n9002,F\n9003,M\n9004,F\n")
    (docs / "mx6_calls.csv").write_text(
        "call_id,date_time,a,b,9001,c,d,e,f,g,h,i,9002\n"
        "777,20100101_120000,a,b,9003,c,d,e,f,g,h,i,9004\n")
    _touch(str(tmp_path / "data" / "ulaw_sphere" /
               "20100101_120000_777_A.sph"))
    iv_rows = []
    for i, spk in enumerate(("9001", "9002")):
        base = f"2010010{i}_13000{i}_LDC_{spk}"
        iv_rows.append(f"{base},a,b,c,d,e,f,12.5,300.0")
        for ch in ("02", "05"):
            _touch(str(tmp_path / "data" / "pcm_flac" / f"CH{ch}" /
                       f"{base}_CH{ch}.flac"))
    (docs / "mx6_ivcomponents.csv").write_text("\n".join(iv_rows) + "\n")
    return tmp_path


def test_make_mx6_calls(tmp_path):
    _mx6_layout(tmp_path)
    dd = C.make_mx6_calls(str(tmp_path))
    # header row's call id has no sphere file; call 777 resolves
    assert sorted(dd.utt2spk) == ["9003_MX6_777_A", "9004_MX6_777_B"]
    assert dd.wav["9003_MX6_777_A"].endswith("#ch0")
    assert dd.spk2gender == {"9003": "m", "9004": "f"}


def test_make_mx6_mic(tmp_path):
    _mx6_layout(tmp_path)
    dd = C.make_mx6_mic(str(tmp_path), "02")
    assert len(dd) == 2
    utt = "9001_MX6_20100100_130000_02"
    assert dd.utt2spk[utt] == "9001"
    # sox decode pipe resamples to 8k and trims to the interview segment
    assert dd.wav[utt].startswith("sox -t flac")
    assert "trim 12.5 =300.0" in dd.wav[utt]
    assert dd.wav[utt].endswith("|")
    with pytest.raises(ValueError):
        C.make_mx6_mic(str(tmp_path), "01")    # interviewer lapel mic


def test_make_mx6_combined(tmp_path):
    _mx6_layout(tmp_path)
    out = C.make_mx6(str(tmp_path), mic_subset=1)
    # all of mic 02 (2 utts) + 1 sampled from mics 04-13 (here CH05)
    assert len(out["mic"]) == 3
    assert len(out["calls"]) == 2
    assert len(out["all"]) == 5
    assert out["all"].spk2gender["9001"] == "m"


def _sre_speaker_list(tmp_path):
    p = tmp_path / "speaker_list"
    p.write_text("spk1 f sre2004 xaaa A\n"
                 "spk2 m sre2004 xaaa B\n"
                 "spk1 f sre2005 xbbb A\n"
                 "spk3 m sre2004 missing A\n")
    return str(p)


def test_make_sre(tmp_path):
    ref = _sre_speaker_list(tmp_path)
    _touch(str(tmp_path / "c04" / "deep" / "xaaa.sph"))
    dd = C.make_sre(str(tmp_path / "c04"), "04", ref)
    assert sorted(dd.utt2spk) == ["spk1-sre04-xaaa-a", "spk2-sre04-xaaa-b"]
    assert dd.wav["spk2-sre04-xaaa-b"].endswith("xaaa.sph#ch1")
    assert dd.spk2gender == {"spk1": "f", "spk2": "m"}


def test_make_sre_04_to_06(tmp_path):
    ref = _sre_speaker_list(tmp_path)
    root = tmp_path / "corpora"
    _touch(str(root / "NIST" / "sre04" / "xaaa.sph"))
    _touch(str(root / "NIST" / "sre05" / "r101_1_1" / "train" / "xbbb.sph"))
    out = C.make_sre_04_to_06(str(root), ref)
    assert set(out) == {"sre2004", "sre2005_train"}   # others missing
    assert len(out["sre2004"]) == 2
    assert out["sre2005_train"].utts == ["spk1-sre05-xbbb-a"]


def test_make_sre08(tmp_path):
    key_root, test_root, train_root = (tmp_path / "key", tmp_path / "test",
                                       tmp_path / "train")
    keys = key_root / "NIST_SRE08_KEYS.v0.1"
    os.makedirs(keys / "model-keys")
    os.makedirs(keys / "trial-keys")
    (keys / "model-keys" / "NIST_SRE08_short2.model.key").write_text(
        "m100,f,segE1:a,sid7\n"
        "m101,m,segE2:b,sid8\n")
    (keys / "trial-keys" / "NIST_SRE08_short2-short3.trial.key").write_text(
        "m100,segT1,a,target\n"
        "m100,segT2,b,nontarget\n"
        "m101,segT2,a,target\n")
    _touch(str(train_root / "data" / "segE1.sph"))
    _touch(str(train_root / "data" / "segE2.sph"))
    _touch(str(test_root / "data" / "segT1.sph"))
    _touch(str(test_root / "data" / "segT2.sph"))
    dd = C.make_sre08(str(key_root), str(test_root), str(train_root))
    assert sorted(dd.utt2spk) == [
        "sid7_SRE08_segE1_A", "sid7_SRE08_segT1_A",
        "sid8_SRE08_segE2_B", "sid8_SRE08_segT2_A"]
    assert dd.utt2spk["sid7_SRE08_segT1_A"] == "sid7"
    assert dd.wav["sid8_SRE08_segE2_B"].endswith("segE2.sph#ch1")
    assert dd.spk2gender == {"sid7": "f", "sid8": "m"}


def test_make_sre10(tmp_path):
    root = tmp_path
    _touch(str(root / "data" / "segE1.sph"))
    _touch(str(root / "data" / "segT1.sph"))
    _touch(str(root / "data" / "16k" / "segT1.sph"))   # excluded duplicate
    os.makedirs(root / "keys")
    os.makedirs(root / "train")
    (root / "keys" / "coreext.modelkey.csv").write_text(
        "m200,sid10\nm201,NOT_SCORED\n")
    (root / "train" / "coreext.trn").write_text(
        "m200 f a/b/segE1.sph:A\n"
        "m201 m a/b/segE1.sph:B\n")
    (root / "keys" / "coreext-coreext.trialkey.csv").write_text(
        "m200,segT1,a,target,x\n"
        "m200,segT1,b,nontarget,x\n")
    dd = C.make_sre10(str(root))
    assert sorted(dd.utt2spk) == ["sid10_SRE10_segE1_A",
                                  "sid10_SRE10_segT1_A"]
    assert dd.spk2gender == {"sid10": "f"}
    assert "16k" not in dd.wav["sid10_SRE10_segT1_A"]


def test_spk2gender_roundtrip(tmp_path):
    from xvector_tpu.io.datadir import DataDir, load_data_dir
    dd = DataDir(utt2spk={"a-1": "a", "b-1": "b"},
                 wav={"a-1": "x.wav", "b-1": "y.wav"},
                 spk2gender={"a": "m", "b": "f"})
    path = str(tmp_path / "dd")
    dd.save(path)
    back = load_data_dir(path)
    assert back.spk2gender == {"a": "m", "b": "f"}
    # filtering drops genders of removed speakers; combine merges them
    only_a = back.filter(["a-1"])
    assert only_a.spk2gender == {"a": "m"}
    assert only_a.combine(back.filter(["b-1"])).spk2gender == dd.spk2gender
    assert back.map_speakers(lambda s: s.upper()).spk2gender == {
        "A": "m", "B": "f"}


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


def test_swbd_cellular_real_world_quirks(tmp_path):
    """Delivery quirks the reference parser tolerates: rows for convs
    whose audio is absent on disk are skipped (make_swbd_cellular1_BUT.pl
    line 51's -e check), extra trailing columns are ignored, and the
    two call sides map to channels 0/1 in conv order."""
    root = tmp_path / "LDC2001S13"
    (root / "doc").mkdir(parents=True)
    (root / "data" / "audio").mkdir(parents=True)
    # audio exists only for 40000
    (root / "data" / "audio" / "sw_40000.sph").write_bytes(b"")
    (root / "doc" / "swb_callstats.tbl").write_text(
        "40000,1001,1002,M,F,extra,columns,ignored\n"
        "40777,1005,1006,M,M\n"          # no audio on disk -> skipped
        "40019,1003,1004,M,M\n")         # bad-audio list -> skipped
    dd = C.make_swbd_cellular(str(root), version=1)
    assert set(dd.utt2spk) == {"sw_1001-swbdc_sw_40000_1",
                               "sw_1002-swbdc_sw_40000_2"}
    assert dd.wav["sw_1001-swbdc_sw_40000_1"].endswith("sw_40000.sph#ch0")
    assert dd.wav["sw_1002-swbdc_sw_40000_2"].endswith("sw_40000.sph#ch1")
    assert dd.spk2gender == {"sw_1001": "m", "sw_1002": "f"}
