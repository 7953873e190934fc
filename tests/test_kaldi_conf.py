"""conf-file parsing + posteriors/segments IO tests."""

import io
import struct

import numpy as np

from xvector_tpu.io import kaldi_ark as kio
from xvector_tpu.utils.kaldi_conf import (mfcc_config_from_conf, parse_conf,
                                          vad_config_from_conf)

# the reference's conf files, verbatim content (conf/mfcc.conf, vad.conf)
MFCC_CONF = """--sample-frequency=8000
--frame-length=25 # the default is 25
--low-freq=20 # the default.
--high-freq=3700 # the default is zero meaning use the Nyquist
--num-ceps=23 # higher than the default which is 12.
--snip-edges=false
"""
VAD_CONF = """--vad-energy-threshold=5.5
--vad-energy-mean-scale=0.5
--vad-proportion-threshold=0.12
--vad-frames-context=2
"""


def test_parse_reference_mfcc_conf(tmp_path):
    p = tmp_path / "mfcc.conf"
    p.write_text(MFCC_CONF)
    cfg = mfcc_config_from_conf(str(p))
    assert cfg.sample_rate == 8000
    assert cfg.frame_length_ms == 25
    assert cfg.low_freq == 20
    assert cfg.high_freq == 3700
    assert cfg.num_ceps == 23
    assert cfg.snip_edges is False
    # untouched defaults survive
    assert cfg.preemph == 0.97
    assert cfg.cepstral_lifter == 22.0


def test_parse_reference_vad_conf(tmp_path):
    p = tmp_path / "vad.conf"
    p.write_text(VAD_CONF)
    cfg = vad_config_from_conf(str(p))
    assert cfg.energy_threshold == 5.5
    assert cfg.energy_mean_scale == 0.5
    assert cfg.proportion_threshold == 0.12
    assert cfg.frames_context == 2


def test_parse_conf_comments(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text("# full comment\n--a=1 # trailing\nnot-a-flag\n--b=x\n")
    assert parse_conf(str(p)) == {"a": "1", "b": "x"}


def test_read_post_ark():
    buf = io.BytesIO()
    buf.write(b"utt1 \x00B")
    buf.write(b"\x04" + struct.pack("<i", 2))          # 2 frames
    for frame in ([(3, 0.5), (7, 0.5)], [(1, 1.0)]):
        buf.write(b"\x04" + struct.pack("<i", len(frame)))
        for idx, w in frame:
            buf.write(b"\x04" + struct.pack("<i", idx))
            buf.write(b"\x04" + struct.pack("<f", w))
    buf.seek(0)
    (key, post), = list(kio.read_post_ark(buf))
    assert key == "utt1"
    assert post[0] == [(3, 0.5), (7, 0.5)]
    assert post[1] == [(1, 1.0)]


def test_segments_bool_vec(tmp_path):
    p = tmp_path / "segments"
    p.write_text("seg1 rec 0.00 0.10\nseg2 rec 0.25 0.40\n")
    vec = kio.read_segments_as_bool_vec(str(p))
    assert vec.shape == (40,)
    assert vec[:10].all() and not vec[10:25].any() and vec[25:40].all()
