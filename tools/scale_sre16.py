"""Scale-shaped real-chip SRE16 run (VERDICT r2 #5).

Generates a synthetic corpus at a realistic shape — >=550 speakers, 8
utterances each, ~7 s per utterance so the reference stage-3 filter
(>500 voiced frames, run.sh:197-212) keeps them — then drives
``cli.run_sre16`` TWICE on the same corpus:

  1. materialised .xta archives (the get_egs.sh/create_tar_files path);
  2. ``--stream-egs`` (materialisation-free streaming from the egs
     feature ark through the ranges plans).

Both runs use the derived archive count (>=40 iterations over 2 epochs),
``--do-final-combination``, and preserve-interval GC.  The two loaders
are bit-identical by construction (tests/test_data_plane.py parity), so
convergence and EER must match; the script asserts the checkpoint GC
keep-set and writes a summary JSON for DESIGN.md.

Usage (on the TPU host):
    PYTHONPATH=/root/repo python tools/scale_sre16.py --out /tmp/scale
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SR = 8000


def _sphere_pcm(samples: np.ndarray) -> bytes:
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
    return head.encode().ljust(1024, b" ") + samples.astype(">i2").tobytes()


def _speaker_wave(rng, spk_seed: int, dur_s: float) -> np.ndarray:
    """Speaker identity = a 3-formant resonance signature + babble."""
    f0 = 250 + (spk_seed * 131) % 2900
    f1 = 350 + (spk_seed * 211) % 2600
    f2 = 500 + (spk_seed * 379) % 2300
    n = int(SR * dur_s)
    t = np.arange(n) / SR
    am = 1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t)
    w = am * (2200 * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6))
              + 1400 * np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6))
              + 900 * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6)))
    w += 180 * rng.randn(n)
    return np.clip(w, -32000, 32000)


def _prebuilt_dir(root, prefix, n_spk, utts_per_spk, rng, seed_base,
                  dur_lo=6.4, dur_hi=8.0):
    """A pre-built Kaldi data dir of single-channel SPHERE files."""
    audio = os.path.join(root, "audio")
    os.makedirs(audio, exist_ok=True)
    utt2spk, wavscp = [], []
    for s in range(n_spk):
        for u in range(utts_per_spk):
            utt = f"{prefix}{s:04d}_{u}"
            path = os.path.join(audio, f"{utt}.sph")
            if not os.path.exists(path):
                dur = rng.uniform(dur_lo, dur_hi)
                with open(path, "wb") as f:
                    f.write(_sphere_pcm(_speaker_wave(rng, seed_base + s,
                                                      dur)))
            utt2spk.append(f"{utt} {prefix}spk{s:04d}")
            wavscp.append(f"{utt} {path}")
    with open(os.path.join(root, "utt2spk"), "w") as f:
        f.write("\n".join(utt2spk) + "\n")
    with open(os.path.join(root, "wav.scp"), "w") as f:
        f.write("\n".join(wavscp) + "\n")
    spk2utt = {}
    for line in utt2spk:
        u, s = line.split()
        spk2utt.setdefault(s, []).append(u)
    with open(os.path.join(root, "spk2utt"), "w") as f:
        for s in sorted(spk2utt):
            f.write(f"{s} {' '.join(spk2utt[s])}\n")


def build_corpus(root: str, n_train_spk: int, n_sre_spk: int,
                 n_eval_spk: int, utts_per_spk: int):
    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, ".corpus_done")
    if os.path.exists(marker):
        return
    _prebuilt_dir(os.path.join(root, "train_dir"), "tr", n_train_spk,
                  utts_per_spk, rng, seed_base=10_000)
    _prebuilt_dir(os.path.join(root, "sre_dir"), "sre", n_sre_spk,
                  utts_per_spk, rng, seed_base=20_000)

    # SRE16 eval in the LDC R149_0_1 layout + evaluation key
    ev = os.path.join(root, "R149_0_1")
    for d in ("docs", "data/enrollment", "data/test"):
        os.makedirs(os.path.join(ev, d), exist_ok=True)
    enroll_rows = ["modelid\tsegmentid"]
    segkey_rows = ["segmentid\tsubjectid"]
    key = os.path.join(root, "download", "sre16_evaluation_key")
    os.makedirs(os.path.join(key, "docs"), exist_ok=True)
    os.makedirs(os.path.join(key, "metadata"), exist_ok=True)
    seg_call = ["segmentid callid"]
    calls = []
    trial_rows = ["modelid segmentid side targettype"]
    test_segs = {}
    for s in range(n_eval_spk):
        for u in range(2):
            seg = f"en{s:03d}{u}"
            with open(os.path.join(ev, "data/enrollment",
                                   f"{seg}.sph"), "wb") as f:
                f.write(_sphere_pcm(_speaker_wave(
                    rng, 30_000 + s, rng.uniform(6.4, 8.0))))
            enroll_rows.append(f"model{s:03d}\t{seg}")
        for u in range(2):
            seg = f"te{s:03d}{u}"
            with open(os.path.join(ev, "data/test", f"{seg}.sph"),
                      "wb") as f:
                f.write(_sphere_pcm(_speaker_wave(
                    rng, 30_000 + s, rng.uniform(4.0, 6.0))))
            segkey_rows.append(f"{seg}\tsubj{s:03d}")
            test_segs[seg] = s
    with open(os.path.join(ev, "docs", "sre16_eval_enrollment.tsv"),
              "w") as f:
        f.write("\n".join(enroll_rows) + "\n")
    with open(os.path.join(ev, "docs", "sre16_eval_segment_key.tsv"),
              "w") as f:
        f.write("\n".join(segkey_rows) + "\n")
    for seg, s in test_segs.items():
        seg_call.append(f"{seg} call_{seg}")
        calls.append(f"call_{seg} " + ("tgl" if s % 2 else "yue"))
        for m in range(n_eval_spk):
            tt = "target" if m == s else "nontarget"
            trial_rows.append(f"model{m:03d} {seg} a {tt}")
    with open(os.path.join(key, "docs", "sre16_eval_segment_key.tsv"),
              "w") as f:
        f.write("\n".join(seg_call) + "\n")
    with open(os.path.join(key, "metadata", "calls.tsv"), "w") as f:
        f.write("\n".join(calls) + "\n")
    with open(os.path.join(key, "docs", "sre16_eval_trial_key.tsv"),
              "w") as f:
        f.write("\n".join(trial_rows) + "\n")

    # unlabeled majors: fresh recordings of eval-adjacent speakers
    major = os.path.join(root, "major", "data", "unlabeled", "major")
    os.makedirs(major, exist_ok=True)
    for s in range(n_eval_spk):
        for u in range(2):
            with open(os.path.join(major, f"mj{s:03d}{u}.sph"),
                      "wb") as f:
                f.write(_sphere_pcm(_speaker_wave(
                    rng, 30_000 + s, rng.uniform(5.0, 7.0))))
    open(marker, "w").close()


def run_variant(corpus: str, work: str, stream: bool,
                frames_per_iter: float):
    from xvector_tpu.cli import run_sre16
    args = [
        "--work-dir", work,
        "--train-data-dir", os.path.join(corpus, "train_dir"),
        "--sre-data-dir", os.path.join(corpus, "sre_dir"),
        "--sre16-eval-root", os.path.join(corpus, "R149_0_1"),
        "--sre16-key-root",
        os.path.join(corpus, "download", "sre16_evaluation_key"),
        "--sre16-major-root", os.path.join(corpus, "major"),
        "--model", "no_dropout", "--num-epochs", "2",
        "--frames-per-iter", str(frames_per_iter),
        "--min-chunk", "200", "--max-chunk", "400",
        "--minibatch-size", "64", "--num-repeats", "35",
        "--do-final-combination", "--max-models-combine", "8",
        "--compute-dtype", "bfloat16", "--lda-dim", "100",
    ]
    if stream:
        args.append("--stream-egs")
    t0 = time.time()
    res = run_sre16.main(args)
    wall = time.time() - t0
    info = json.load(open(os.path.join(work, "egs_info.json")))
    metrics = [json.loads(l) for l in
               open(os.path.join(work, "exp", "metrics.jsonl"))]
    train_loss = [m["loss"] for m in metrics if m["kind"] == "train"]
    valid = [m for m in metrics if m["kind"] == "valid"]
    kept = sorted(int(n[6:]) for n in os.listdir(os.path.join(work, "exp"))
                  if n.startswith("model_") and n[6:].isdigit())
    # GC keep-set: every iteration the policy REQUIRES must be present —
    # the last two, preserve-interval multiples, and the combination
    # candidate set.  Extra checkpoints can legitimately remain from an
    # interrupted earlier invocation with a different candidate cap (GC
    # never re-deletes), so they are recorded, not asserted away.
    from xvector_tpu.train.combine import combine_iterations
    n_iter = len(train_loss)
    expected = {it for it in range(0, n_iter + 1)
                if it >= n_iter - 1 or it % 10 == 0}
    expected |= set(combine_iterations(n_iter, info["num_archives"], 8))
    missing = expected - set(kept)
    assert not missing, f"GC deleted required checkpoints: {missing}"
    walls_path = os.path.join(work, "stage_walls.json")
    stage_walls = (json.load(open(walls_path))
                   if os.path.exists(walls_path) else {})
    return {"wall_s": round(wall, 1), "stage_walls": stage_walls,
            "stream": stream,
            "gc_extra_kept": sorted(set(kept) - expected),
            "num_archives": info["num_archives"],
            "num_iterations": len(train_loss),
            "first_loss": train_loss[0], "final_loss": train_loss[-1],
            "final_valid": valid[-1]["loss"] if valid else None,
            "kept_checkpoints": kept,
            "eer": {k: v["eer"] for k, v in res.items()},
            "min_dcf": {k: v["min_dcf"] for k, v in res.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-spk", type=int, default=400)
    ap.add_argument("--sre-spk", type=int, default=150)
    ap.add_argument("--eval-spk", type=int, default=30)
    ap.add_argument("--utts-per-spk", type=int, default=8)
    ap.add_argument("--frames-per-iter", type=float, default=5e6)
    args = ap.parse_args()

    corpus = os.path.join(args.out, "corpus")
    print(f"== corpus: {args.train_spk}+{args.sre_spk} speakers x "
          f"{args.utts_per_spk} utts")
    t0 = time.time()
    build_corpus(corpus, args.train_spk, args.sre_spk, args.eval_spk,
                 args.utts_per_spk)
    print(f"   built in {time.time()-t0:.0f}s")

    results = {}
    for stream in (False, True):
        name = "stream" if stream else "materialised"
        print(f"== run: {name}")
        results[name] = run_variant(
            corpus, os.path.join(args.out, f"work_{name}"), stream,
            args.frames_per_iter)
        print("  ", json.dumps(results[name]))

    # GC keep-set: last two + every preserve_interval-th + combine set
    with open(os.path.join(args.out, "scale_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
