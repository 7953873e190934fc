"""End-to-end SRE16 recipe driver test on a synthetic LDC-shaped corpus
tree: SWBD-cellular training data (2-channel PCM SPHERE + callstats
table), SRE16 eval enrollment/test with trial + language keys, unlabeled
majors — through corpus prep, features, egs, training, extraction,
speaker-mean enrollment and the dual-scoring back-end."""

import json
import os
import struct

import numpy as np
import pytest

from xvector_tpu.cli import run_sre16

SR = 8000


def _sphere_pcm(samples: np.ndarray) -> bytes:
    """Minimal NIST SPHERE, 16-bit big-endian PCM, 1-2 channels."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nchan = samples.shape
    head = ("NIST_1A\n   1024\n"
            f"sample_count -i {n}\n"
            f"channel_count -i {nchan}\n"
            f"sample_rate -i {SR}\n"
            "sample_n_bytes -i 2\n"
            "sample_byte_format -s2 10\n"
            "sample_coding -s3 pcm\nend_head\n")
    body = samples.astype(">i2").tobytes()
    return head.encode().ljust(1024, b" ") + body


def _speaker_wave(rng, spk_seed: int, dur_s: float = 3.0) -> np.ndarray:
    f0 = 300 + (spk_seed * 137) % 2800
    f1 = 400 + (spk_seed * 211) % 2500
    t = np.arange(int(SR * dur_s)) / SR
    w = (2500 * np.sin(2 * np.pi * f0 * t)
         + 1500 * np.sin(2 * np.pi * f1 * t + 1.0)
         + 150 * rng.randn(len(t)))
    return np.clip(w, -32000, 32000)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("sre16corpus")
    rng = np.random.RandomState(0)

    # ---- SWBD cellular 1: conv sides carry one speaker per channel ----
    swbd = root / "LDC2001S13"
    (swbd / "doc").mkdir(parents=True)
    (swbd / "data" / "audio").mkdir(parents=True)
    lines = []
    n_spk = 10
    for conv in range(n_spk // 2):
        sA, sB = 2 * conv, 2 * conv + 1
        wav = np.stack([_speaker_wave(rng, sA), _speaker_wave(rng, sB)],
                       axis=1)
        # 3 conversations per pair so each speaker gets >= 3 utterances
        for rep in range(3):
            cid = f"4{conv}{rep:02d}"
            (swbd / "data" / "audio" / f"sw_{cid}.sph").write_bytes(
                _sphere_pcm(np.roll(wav, rep * 640, axis=0)))
            lines.append(f"{cid},{1000+sA},{1000+sB},M,F")
    (swbd / "doc" / "swb_callstats.tbl").write_text("\n".join(lines))

    # ---- SRE16 eval: 4 eval speakers, 2 enroll utts + 2 test segs ----
    ev = root / "R149_0_1"
    (ev / "docs").mkdir(parents=True)
    (ev / "data" / "enrollment").mkdir(parents=True)
    (ev / "data" / "test").mkdir(parents=True)
    enroll_rows = ["modelid\tsegmentid"]
    segkey_rows = ["segmentid\tsubjectid"]
    n_eval = 4
    test_segs = {}
    for s in range(n_eval):
        for u in range(2):
            seg = f"en{s}{u}"
            (ev / "data" / "enrollment" / f"{seg}.sph").write_bytes(
                _sphere_pcm(_speaker_wave(rng, 100 + s)))
            enroll_rows.append(f"model{s}\t{seg}")
        for u in range(2):
            seg = f"te{s}{u}"
            (ev / "data" / "test" / f"{seg}.sph").write_bytes(
                _sphere_pcm(_speaker_wave(rng, 100 + s, dur_s=1.7)))
            segkey_rows.append(f"{seg}\tsubj{s}")
            test_segs[seg] = s
    (ev / "docs" / "sre16_eval_enrollment.tsv").write_text(
        "\n".join(enroll_rows) + "\n")
    (ev / "docs" / "sre16_eval_segment_key.tsv").write_text(
        "\n".join(segkey_rows) + "\n")

    # evaluation key (trials + languages), reference layout
    key = root / "download" / "sre16_evaluation_key"
    (key / "docs").mkdir(parents=True)
    (key / "metadata").mkdir(parents=True)
    seg_call = ["segmentid callid"]
    calls = []
    trial_rows = ["modelid segmentid side targettype"]
    for seg, s in test_segs.items():
        seg_call.append(f"{seg} call_{seg}")
        calls.append(f"call_{seg} " + ("tgl" if s % 2 else "yue"))
        for m in range(n_eval):
            tt = "target" if m == s else "nontarget"
            trial_rows.append(f"model{m} {seg} a {tt}")
    (key / "docs" / "sre16_eval_segment_key.tsv").write_text(
        "\n".join(seg_call) + "\n")
    (key / "metadata" / "calls.tsv").write_text("\n".join(calls) + "\n")
    (key / "docs" / "sre16_eval_trial_key.tsv").write_text(
        "\n".join(trial_rows) + "\n")

    # ---- unlabeled majors: same eval speakers, fresh noise draws ----
    major = root / "major"
    (major / "data" / "unlabeled" / "major").mkdir(parents=True)
    for s in range(n_eval):
        for u in range(3):
            (major / "data" / "unlabeled" / "major" / f"mj{s}{u}.sph") \
                .write_bytes(_sphere_pcm(_speaker_wave(rng, 100 + s)))

    # ---- an "SRE" corpus as a pre-built Kaldi data dir: its speakers
    # define the PLDA training subset (run.sh:181-185 sre_combined) ----
    sre = root / "sre_datadir"
    (sre / "audio").mkdir(parents=True)
    utt2spk, wavscp = [], []
    for s in range(10):
        for u in range(3):
            utt = f"sre{s:02d}_{u}"
            path = sre / "audio" / f"{utt}.sph"
            path.write_bytes(_sphere_pcm(_speaker_wave(rng, 200 + s)))
            utt2spk.append(f"{utt} srespk{s:02d}")
            wavscp.append(f"{utt} {path}")
    (sre / "utt2spk").write_text("\n".join(utt2spk) + "\n")
    (sre / "wav.scp").write_text("\n".join(wavscp) + "\n")
    (sre / "spk2utt").write_text("\n".join(
        f"srespk{s:02d} " + " ".join(f"sre{s:02d}_{u}" for u in range(3))
        for s in range(10)) + "\n")
    return root


def test_sre16_eval_full_builder(corpus):
    full = run_sre16.corpora.make_sre16_eval_full(
        str(corpus / "R149_0_1"),
        key_root=str(corpus / "download" / "sre16_evaluation_key"))
    assert len(full["trials"]) == 8 * 4
    assert set(full["utt2lang"].values()) == {"tgl", "yue"}
    assert set(full["trials_by_lang"]) == {"tgl", "yue"}
    assert sum(l for _, _, l in full["trials"]) == 8  # one target model/seg
    assert len(full["enroll"]) == 8 and len(full["test"]) == 8


def test_run_sre16_end_to_end(corpus, tmp_path, capsys):
    res = run_sre16.main([
        "--work-dir", str(tmp_path / "exp"),
        "--swbd-cell1-root", str(corpus / "LDC2001S13"),
        "--sre-data-dir", str(corpus / "sre_datadir"),
        "--sre16-eval-root", str(corpus / "R149_0_1"),
        "--sre16-key-root",
        str(corpus / "download" / "sre16_evaluation_key"),
        "--sre16-major-root", str(corpus / "major"),
        "--model", "tiny", "--num-epochs", "2",
        "--frames-per-iter", "25000",   # derive num_archives (get_egs:120)
        "--min-chunk", "40", "--max-chunk", "80",
        "--min-utt-frames", "39", "--min-spk-utts", "2",
        "--minibatch-size", "8", "--num-repeats", "6",
        "--compute-dtype", "float32", "--lda-dim", "8",
    ])
    out = capsys.readouterr().out
    assert "out_of_domain" in res and "adapted" in res
    for variant in ("out_of_domain", "adapted"):
        r = res[variant]
        assert r["num_trials"] == 32
        # toy corpus: require clear separation out-of-domain.  The
        # adapted variant DEGRADES here by construction (the synthetic
        # majors share speakers/domain with eval, so unsupervised
        # covariance adaptation pushes speaker variance into the within
        # class) — only assert it is not beyond chance (32 trials →
        # EER granularity 1/24, measured 0.458 on the round-4 snapped
        # chunk draw).  Adaptation IMPROVING EER under a real domain
        # shift is asserted properly in tests/test_backend.py::
        # test_plda_adaptation_improves_under_domain_shift.
        bound = 0.30 if variant == "out_of_domain" else 0.50
        assert r["eer"] <= bound, f"{variant} EER {r['eer']}"
        assert set(r["per_condition"]) == {"tgl", "yue"}
        assert os.path.exists(tmp_path / "exp" / f"scores_{variant}.txt")
    results = json.load(open(tmp_path / "exp" / "sre16_results.json"))
    assert set(results) == {"out_of_domain", "adapted"}
    assert "EER" in out

    # PLDA pool protocol (run.sh:181-185): the sre_combined extraction
    # covers exactly the SRE-speaker utterances, none of the SWBD ones,
    # and is NOT subject to the stage-3 egs filters
    assert "sre_combined (SRE-speaker subset" in out
    from xvector_tpu.io import kaldi_ark as kio
    pool = dict(kio.read_vec_flt_scp(
        str(tmp_path / "exp" / "xvector_sre_combined.scp")))
    assert len(pool) == 30 and all(u.startswith("sre") for u in pool)

    # the stage-3 filter counts are logged (run.sh:197-212 semantics)
    assert "egs filter:" in out
    # num_archives was derived, not defaulted: ~30 SWBD (3 s) + 30 SRE
    # (3 s) utts of ~300 voiced frames * 6 repeats / 25k per iter + 1
    info = json.load(open(tmp_path / "exp" / "egs_info.json"))
    assert info["num_archives"] == \
        info["num_train_frames"] * 6 // 25000 + 1
    assert info["num_archives"] >= 2


def test_sre16_key_found_in_root_docs_layout(corpus, tmp_path):
    """Post-eval LDC trees merge the evaluation key into <root>/docs +
    <root>/metadata; the builder must find it there without an explicit
    key_root (review r2: the reference's own db_base layout)."""
    import shutil

    merged = tmp_path / "merged_root"
    shutil.copytree(corpus / "R149_0_1", merged)
    key = corpus / "download" / "sre16_evaluation_key"
    # trial key into docs/, language map into metadata/
    shutil.copy(key / "docs" / "sre16_eval_trial_key.tsv",
                merged / "docs")
    (merged / "metadata").mkdir()
    shutil.copy(key / "metadata" / "calls.tsv", merged / "metadata")
    # merged trees carry ONE rich segment key (subjectid AND callid);
    # the parser must pick the call column by header
    seg2call = dict(
        line.split()[:2]
        for line in (key / "docs" / "sre16_eval_segment_key.tsv")
        .read_text().splitlines()[1:])
    rows = ["segmentid\tsubjectid\tcallid"]
    for line in (merged / "docs" / "sre16_eval_segment_key.tsv") \
            .read_text().splitlines()[1:]:
        seg, subj = line.split("\t")
        rows.append(f"{seg}\t{subj}\t{seg2call[seg]}")
    (merged / "docs" / "sre16_eval_segment_key.tsv").write_text(
        "\n".join(rows) + "\n")
    full = run_sre16.corpora.make_sre16_eval_full(str(merged))
    assert len(full["trials"]) == 32
    assert set(full["utt2lang"].values()) == {"tgl", "yue"}


def test_stage_gating_maps_to_recipe_artifacts(corpus, tmp_path):
    """--stage uses run.sh's 0-10 numbering; forcing stage 7 must clear
    extraction artifacts but keep features/egs/checkpoints (review r3:
    the raw number was previously passed to the recipe's 1-4 artifact
    stages, clearing nothing)."""
    work = tmp_path / "exp"
    args = [
        "--work-dir", str(work),
        "--swbd-cell1-root", str(corpus / "LDC2001S13"),
        "--sre16-eval-root", str(corpus / "R149_0_1"),
        "--sre16-key-root",
        str(corpus / "download" / "sre16_evaluation_key"),
        "--sre16-major-root", str(corpus / "major"),
        "--model", "tiny", "--num-epochs", "1", "--num-archives", "2",
        "--min-chunk", "40", "--max-chunk", "80",
        "--min-utt-frames", "39", "--min-spk-utts", "2",
        "--minibatch-size", "8", "--num-repeats", "4",
        "--compute-dtype", "float32", "--lda-dim", "8",
    ]
    run_sre16.main(args)
    feats_done = work / "feats_train.ark.done"
    xv_done = work / "xvector_sre_combined.scp.done"
    assert feats_done.exists() and xv_done.exists()
    t_feats = feats_done.stat().st_mtime

    run_sre16.main(args + ["--stage", "7"])
    # features untouched (same file), extraction recomputed
    assert feats_done.stat().st_mtime == t_feats
    assert xv_done.exists()          # regenerated
