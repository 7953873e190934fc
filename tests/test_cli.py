"""CLI entry-point tests: train_dnn + extract_embedding end-to-end over a
tiny egs dir, reference flag spellings, idempotent restart."""

import os

import numpy as np
import pytest

from xvector_tpu.cli import extract_embedding, train_dnn
from xvector_tpu.data import archives as AR
from xvector_tpu.io import kaldi_ark as kio


NUM_SPK = 4


def _make_egs(tmp_path, n_archives=2):
    rng = np.random.RandomState(0)
    means = rng.randn(NUM_SPK, 23) * 2
    for a in range(n_archives):
        mbs = []
        for _ in range(3):
            y = rng.randint(0, NUM_SPK, 8).astype(np.int32)
            x = (rng.randn(8, 64, 23) * 0.3
                 + means[y][:, None, :]).astype(np.float16)
            mbs.append((x, y, 64))
        AR.write_archive(str(tmp_path / f"egs.{a}.xta"), mbs)
    # diagnostic archive
    y = rng.randint(0, NUM_SPK, 8).astype(np.int32)
    x = (rng.randn(8, 64, 23) * 0.3 + means[y][:, None, :]) \
        .astype(np.float16)
    AR.write_archive(str(tmp_path / "valid_egs.xta"), [(x, y, 64)])


def test_train_and_extract_cli(tmp_path, capsys):
    egs = tmp_path / "egs"
    egs.mkdir()
    _make_egs(egs)
    work = str(tmp_path / "exp")
    train_dnn.main([
        "--tf-model-class=ModelWithoutDropout",   # reference class name
        "--model=tiny",                            # overridden by preset?
        f"--num-targets={NUM_SPK}",
        "--num-epochs=1", "--compute-dtype=float32",
        "--initial-effective-lrate=0.002",
        "--final-effective-lrate=0.0005",
        f"--egs-dir={egs}", f"--dir={work}", "--block-size=2",
    ])
    assert os.path.islink(os.path.join(work, "model_final"))
    assert os.path.exists(os.path.join(work, "accuracy.report"))
    report = open(os.path.join(work, "accuracy.report")).read()
    assert "valid_loss" in report.splitlines()[0]

    # build a feature ark and extract through the CLI
    rng = np.random.RandomState(1)
    feats_ark = str(tmp_path / "feats.ark")
    with kio.ArkWriter(feats_ark, feats_ark + ".scp") as w:
        for i in range(5):
            w.write(f"utt{i}", rng.randn(80 + 10 * i, 23)
                    .astype(np.float32))
    out_ark = str(tmp_path / "xvector.ark")
    extract_embedding.main([
        f"--model-dir={work}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        f"--feats-rspecifier=ark:{feats_ark}",
        f"--output-ark={out_ark}", "--batch-size=4",
        "--min-chunk-size=25", "--chunk-size=100",
    ])
    xv = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", ".scp")))
    assert len(xv) == 5
    assert all(v.shape == (64,) for v in xv.values())   # tiny embed dim

    # idempotent restart: second call must skip
    extract_embedding.main([
        f"--model-dir={work}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        "--feats-rspecifier=ark:/nonexistent.ark",     # would fail if read
        f"--output-ark={out_ark}",
    ])
    out = capsys.readouterr().out
    assert "skipping" in out


def test_train_cli_rejects_unknown_model(tmp_path):
    with pytest.raises(SystemExit):
        train_dnn.main(["--model=bogus", "--num-targets=4",
                        f"--egs-dir={tmp_path}", f"--dir={tmp_path}/x"])


def test_extract_cli_spk_means(tmp_path):
    """--spk2utt writes speaker-mean x-vectors + num_utts (ivector-mean)."""
    egs = tmp_path / "egs"
    egs.mkdir()
    _make_egs(egs, n_archives=1)
    work = str(tmp_path / "exp")
    train_dnn.main([
        "--model=tiny", f"--num-targets={NUM_SPK}", "--num-epochs=1",
        "--compute-dtype=float32", f"--egs-dir={egs}", f"--dir={work}",
        "--block-size=2",
    ])
    rng = np.random.RandomState(2)
    feats_ark = str(tmp_path / "f.ark")
    with kio.ArkWriter(feats_ark, feats_ark + ".scp") as w:
        for i in range(4):
            w.write(f"u{i}", rng.randn(80, 23).astype(np.float32))
    spk2utt = tmp_path / "spk2utt"
    spk2utt.write_text("sA u0 u1 u2\nsB u3\n")
    out_ark = str(tmp_path / "xv2.ark")
    extract_embedding.main([
        f"--model-dir={work}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        f"--feats-rspecifier=ark:{feats_ark}",
        f"--output-ark={out_ark}", f"--spk2utt={spk2utt}",
    ])
    spk = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", "_spk.scp")))
    assert set(spk) == {"sA", "sB"}
    utt = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", ".scp")))
    np.testing.assert_allclose(
        spk["sA"], np.mean([utt["u0"], utt["u1"], utt["u2"]], axis=0),
        atol=1e-6)
    num_utts = dict(l.split() for l in
                    open(out_ark.replace(".ark", "_num_utts.ark")))
    assert num_utts == {"sA": "3", "sB": "1"}


def test_eval_dnn_cli(tmp_path, capsys):
    from xvector_tpu.cli import eval_dnn
    egs = tmp_path / "egs"
    egs.mkdir()
    _make_egs(egs, n_archives=1)
    work = str(tmp_path / "exp")
    train_dnn.main([
        "--model=tiny", f"--num-targets={NUM_SPK}", "--num-epochs=1",
        "--compute-dtype=float32", f"--egs-dir={egs}", f"--dir={work}",
        "--block-size=2",
    ])
    capsys.readouterr()
    eval_dnn.main([f"--model-dir={work}", "--model=tiny",
                   f"--num-targets={NUM_SPK}",
                   f"--egs={egs}/valid_egs.xta"])
    import json as _json
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["accuracy"] <= 1.0
    assert out["loss"] > 0.0


def test_get_egs_cli_to_train(tmp_path, capsys):
    """get_egs.sh contract: a Kaldi-format data dir (utt2spk + feats.scp)
    → egs dir with archives, pdf2num and info/ files, consumable by the
    train CLI."""
    from xvector_tpu.cli import get_egs
    rng = np.random.RandomState(0)
    means = rng.randn(NUM_SPK, 23) * 2
    data = tmp_path / "data"
    data.mkdir()
    ark = str(tmp_path / "feats.ark")
    utt2spk = {}
    with kio.ArkWriter(ark, ark + ".scp") as w:
        for s in range(NUM_SPK):
            for i in range(3):
                utt = f"s{s}-u{i}"
                utt2spk[utt] = f"s{s}"
                w.write(utt, (rng.randn(120, 23) * 0.3
                              + means[s]).astype(np.float32))
    with open(data / "utt2spk", "w") as f:
        for u, s in sorted(utt2spk.items()):
            f.write(f"{u} {s}\n")
    os.rename(ark + ".scp", data / "feats.scp")

    egs = str(tmp_path / "egs")
    get_egs.main([
        "--min-frames-per-chunk=30", "--max-frames-per-chunk=60",
        "--minibatch-size=4", "--num-repeats=2",
        "--frames-per-iter=2000", "--num-heldout-utts=2",
        str(data), egs])
    out = capsys.readouterr().out
    assert "targets" in out
    assert os.path.exists(os.path.join(egs, "egs.0.xta"))
    assert os.path.exists(os.path.join(egs, "valid_egs.xta"))
    assert int(open(os.path.join(egs, "info", "feat_dim")).read()) == 23
    n_arch = int(open(os.path.join(egs, "info", "num_archives")).read())
    assert n_arch >= 1
    n_tgt = int(open(os.path.join(egs, "info", "num_targets")).read())
    assert n_tgt == NUM_SPK

    work = str(tmp_path / "exp")
    train_dnn.main([
        "--tf-model-class=ModelWithoutDropout", "--model=tiny",
        f"--num-targets={n_tgt}", "--num-epochs=1",
        "--compute-dtype=float32", f"--egs-dir={egs}",
        f"--dir={work}", "--block-size=2"])
    assert os.path.exists(os.path.join(work, "model_final"))


def _write_wav(path, samples, sr=8000):
    import wave as wavmod
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.clip(samples, -32768, 32767)
                      .astype("<i2").tobytes())


def test_run_cli_with_corpus_and_augmentation(tmp_path, capsys):
    """Full staged driver from on-disk artifacts: Kaldi data dir +
    MUSAN/RIRS trees → augment → features → egs → train → extract →
    score (the run.sh stages end to end)."""
    from xvector_tpu.cli import run as run_cli

    rng = np.random.RandomState(0)
    sr = 8000
    # corpus: 3 two-tone speakers x 4 utts, as Kaldi data dir on disk
    corpus = tmp_path / "corpus"
    dd = tmp_path / "data"
    os.makedirs(dd)
    f0 = rng.uniform(300, 3000, size=(3, 2))
    wav_lines, u2s_lines = [], []
    for s in range(3):
        for u in range(4):
            t = np.arange(int(sr * 2.0)) / sr
            w = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
                    for f in f0[s])
            utt, spk = f"spk{s}_u{u}", f"spk{s}"
            p = str(corpus / f"{utt}.wav")
            _write_wav(p, 3000 * w + 200 * rng.randn(len(t)))
            wav_lines.append(f"{utt} {p}")
            u2s_lines.append(f"{utt} {spk}")
    (dd / "wav.scp").write_text("\n".join(wav_lines) + "\n")
    (dd / "utt2spk").write_text("\n".join(u2s_lines) + "\n")
    # tiny MUSAN + RIRS trees
    musan = tmp_path / "musan"
    _write_wav(str(musan / "noise" / "free" / "n1.wav"),
               rng.randn(sr) * 500)
    _write_wav(str(musan / "music" / "fma" / "m1.wav"),
               np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 4000)
    rirs = tmp_path / "RIRS" / "simulated_rirs"
    _write_wav(str(rirs / "smallroom" / "r1.wav"),
               np.exp(-np.arange(200) / 30) * 20000)
    _write_wav(str(rirs / "mediumroom" / "r2.wav"),
               np.exp(-np.arange(400) / 80) * 20000)

    run_cli.main([
        f"--work-dir={tmp_path / 'exp'}", f"--data-dir={dd}",
        f"--musan-dir={musan}", f"--rirs-dir={tmp_path / 'RIRS'}",
        "--model=tiny", "--num-epochs=2", "--num-archives=2",
        "--min-chunk=40", "--max-chunk=80", "--minibatch-size=4",
        "--compute-dtype=float32"])
    out = capsys.readouterr().out
    assert "stage 0: augmentation" in out
    assert "rirs=True noise=True music=True babble=False" in out
    assert "EER" in out
    # augmented copies made it into the feature arks
    scp = (tmp_path / "exp" / "feats_all.ark.scp").read_text()
    assert "spk0_u0-reverb" in scp and "spk0_u0-noise" in scp \
        and "spk0_u0-music" in scp


def test_make_features_batched_matches_single(tmp_path):
    """The bucketed/batched feature stage (VERDICT r1 #5) must reproduce
    the per-utterance mfcc/energy_vad outputs row for row (dither off,
    uncompressed arks for exact comparison)."""
    from xvector_tpu.cli.run import Recipe, RecipeConfig
    from xvector_tpu.io.datadir import DataDir
    from xvector_tpu.ops import features as F

    rng = np.random.RandomState(0)
    lens = [8000, 4400, 16000, 7999, 12345, 6000, 9000]
    # integer-valued like real decoded audio (the stage quantises to
    # int16 for the upload, as a 16-bit wav write would)
    waves = {f"u{i}": np.rint(rng.randn(n) * 2000).astype(np.float32)
             for i, n in enumerate(lens)}
    data = DataDir(utt2spk={u: "spk" for u in waves})
    recipe = Recipe(RecipeConfig(work_dir=str(tmp_path),
                                 compress_feats=False,
                                 feature_batch_size=3))
    out = recipe.make_features(data, lambda u: waves[u], split="t",
                               dither_seed=None)
    feats = dict(kio.read_mat_scp(str(tmp_path / "feats_t.ark.scp")))
    vads = dict(kio.read_vec_flt_scp(str(tmp_path / "vad_t.ark.scp")))
    cfg = F.MfccConfig(dither=0.0)
    for u, w in waves.items():
        want = np.asarray(F.mfcc(w, cfg))
        np.testing.assert_allclose(feats[u], want, rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(
            vads[u], np.asarray(F.energy_vad(want)))
        assert out.utt2num_frames[u] == want.shape[0]


def test_force_from_stage_clears_only_later_stages(tmp_path):
    from xvector_tpu.cli.run import Recipe, RecipeConfig

    recipe = Recipe(RecipeConfig(work_dir=str(tmp_path)))
    artifacts = {
        1: ["feats_all.ark", "feats_all.ark.done", "vad_all.ark.scp"],
        2: ["egs_feats.ark.done", "egs.0.xta", "pdf2num",
            "valid_egs.xta"],
        3: ["exp/model_3/done"],
        4: ["xvector_all.ark", "xvector_all.scp.done"],
    }

    def make_all():
        for files in artifacts.values():
            for f in files:
                p = tmp_path / f
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text("x")

    make_all()
    recipe.force_from_stage(4)
    assert (tmp_path / "feats_all.ark.done").exists()
    assert (tmp_path / "exp/model_3/done").exists()
    assert not (tmp_path / "xvector_all.scp.done").exists()

    make_all()
    recipe.force_from_stage(3)
    assert (tmp_path / "egs.0.xta").exists()
    assert not (tmp_path / "exp").exists()
    assert not (tmp_path / "xvector_all.ark").exists()

    make_all()
    recipe.force_from_stage(1)
    for files in artifacts.values():
        for f in files:
            assert not (tmp_path / f).exists(), f


def test_extract_cli_from_wav(tmp_path):
    """--wav-rspecifier: extraction straight from a wav.scp (incl. an
    embedded-shorten SPHERE channel spec) through the one-dispatch
    waveform pipeline."""
    import struct
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import shorten_ref as enc

    egs = tmp_path / "egs"
    egs.mkdir()
    _make_egs(egs, n_archives=1)
    work = str(tmp_path / "exp")
    train_dnn.main([
        "--model=tiny", f"--num-targets={NUM_SPK}", "--num-epochs=1",
        "--compute-dtype=float32", f"--egs-dir={egs}", f"--dir={work}",
        "--block-size=2",
    ])
    rng = np.random.RandomState(3)

    def riff(samples):
        data = samples.astype("<i2").tobytes()
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                        16000, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data)

    w0 = np.clip(rng.randn(9000) * 2000, -32768, 32767)
    (tmp_path / "a.wav").write_bytes(riff(w0))
    stereo = np.clip(np.cumsum(rng.randint(-300, 300, size=(8000, 2)),
                               axis=0), -32768, 32767).astype(np.int64)
    (tmp_path / "b.sph").write_bytes(enc.sphere_with_shorten(stereo))
    wav_scp = tmp_path / "wav.scp"
    wav_scp.write_text(
        f"utt_a {tmp_path}/a.wav\nutt_b {tmp_path}/b.sph#ch1\n")

    out_ark = str(tmp_path / "xv_wav.ark")
    extract_embedding.main([
        f"--model-dir={work}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        f"--wav-rspecifier=scp:{wav_scp}",
        f"--output-ark={out_ark}", "--batch-size=2",
        "--compute-dtype=float32",
    ])
    xv = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", ".scp")))
    assert set(xv) == {"utt_a", "utt_b"}
    assert all(np.isfinite(v).all() and v.shape == (64,)
               for v in xv.values())


def test_extract_cli_from_reference_h5(tmp_path):
    """--reference-h5: extraction from a reference-trainer h5 export, no
    checkpoint dir needed (trained TF1 models migrate directly)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    from test_utils import _write_reference_h5
    from xvector_tpu.models import tdnn

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(4), cfg, NUM_SPK)
    h5 = str(tmp_path / "model.h5")
    _write_reference_h5(h5, params, state, cfg)

    rng = np.random.RandomState(5)
    feats_ark = str(tmp_path / "f.ark")
    with kio.ArkWriter(feats_ark, feats_ark + ".scp") as w:
        for i in range(3):
            w.write(f"u{i}", rng.randn(90, 23).astype(np.float32))
    out_ark = str(tmp_path / "xvh5.ark")
    extract_embedding.main([
        f"--reference-h5={h5}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        f"--feats-rspecifier=ark:{feats_ark}",
        f"--output-ark={out_ark}", "--compute-dtype=float32",
    ])
    xv = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", ".scp")))
    assert len(xv) == 3
    # must equal direct library extraction with the same imported weights
    import jax.numpy as jnp
    ref = np.asarray(tdnn.extract_xvector(
        cfg, params, state,
        np.asarray(next(iter(kio.read_mat_ark(feats_ark)))[1])[None],
        compute_dtype=jnp.float32))[0]
    np.testing.assert_allclose(xv["u0"], ref, rtol=1e-4, atol=1e-4)
