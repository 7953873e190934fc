"""Extraction CLI: features rspecifier → x-vector ark+scp.

Reference-shaped replacement for ``extract_embedding.py:94-150`` +
``extract_xvectors.sh``: reads a feature rspecifier (ark/scp/pipe — the
same ``apply-cmvn-sliding … |`` pipes work, or pass ``--apply-cmvn`` /
``--vad-scp`` to run the native preprocessing), extracts chunk-and-averaged
x-vectors batched on the TPU, writes Kaldi ark+scp ready for any PLDA
back-end.  Idempotent: skips if the output scp is complete.
"""

from __future__ import annotations

import argparse
import os
import sys

from ..extract.extractor import ExtractorConfig, XvectorExtractor, preprocess
from ..io import kaldi_ark as kio
from ..models import tdnn
from ..train import checkpoints
from ..train.trainer import TrainConfig, Trainer


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", default="",
                   help="trainer work dir (uses model_final)")
    p.add_argument("--reference-h5", default="",
                   help="instead of --model-dir: a model.h5 exported by "
                        "the REFERENCE trainer (models.py:180-214) — "
                        "trained TF1 models migrate without retraining")
    p.add_argument("--model", default="ModelWithoutDropout")
    p.add_argument("--num-targets", type=int, required=True)
    p.add_argument("--feats-rspecifier", default="",
                   help="feature ark/scp/pipe input (mutually exclusive "
                        "with --wav-rspecifier)")
    p.add_argument("--wav-rspecifier", default="",
                   help="wav.scp input: extraction runs straight from the "
                        "waveform as ONE on-device program per length "
                        "bucket (MFCC+VAD+CMVN+TDNN fused; collapses "
                        "run.sh:97-101 + extract_xvectors.sh:68 + the "
                        "forward into a single dispatch)")
    p.add_argument("--vad-scp", default="",
                   help="optional vad.scp for voiced-frame selection")
    p.add_argument("--apply-cmvn", action="store_true",
                   help="apply sliding CMVN (win 300) natively")
    p.add_argument("--min-chunk-size", type=int, default=25)
    p.add_argument("--chunk-size", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=32)  # sweep-optimal
    p.add_argument("--feat-dim", type=int, default=23)
    p.add_argument("--output-ark", required=True)
    p.add_argument("--output-scp", default="")
    p.add_argument("--spk2utt", default="",
                   help="optional spk2utt file; also writes speaker-mean "
                        "x-vectors + num_utts (ivector-mean parity, "
                        "extract_xvectors.sh:100-102)")
    p.add_argument("--num-shards", type=int, default=1,
                   help="utterance-level sharding for multi-process "
                        "extraction (extract_xvectors.sh's nj-way split)")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="forward compute dtype; bf16 feeds the MXU at 2x "
                        "the f32 rate (f32 'matmuls' on TPU run as bf16 "
                        "passes anyway unless precision=HIGHEST)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    scp = args.output_scp or args.output_ark.replace(".ark", ".scp")
    if os.path.exists(scp + ".done"):
        print(f"{scp} already complete; skipping (idempotent restart)")
        return

    if bool(args.model_dir) == bool(args.reference_h5):
        sys.exit("pass exactly one of --model-dir/--reference-h5")
    preset = tdnn.REFERENCE_CLASS_TO_PRESET.get(args.model, args.model)
    if args.reference_h5:
        import tempfile

        from ..utils.export import import_reference_h5
        cfg = TrainConfig(model=preset, num_targets=args.num_targets,
                          compute_dtype="bfloat16")
        # scratch work dir (no checkpoints are read or written); the
        # TemporaryDirectory object rides on the trainer so it is
        # removed at finalisation instead of leaking per run
        tmp = tempfile.TemporaryDirectory(prefix="xv_ref_h5_")
        trainer = Trainer(cfg, tmp.name, feat_dim=args.feat_dim)
        trainer._scratch_dir = tmp
        trainer.params, trainer.state = import_reference_h5(
            args.reference_h5, trainer.model_cfg, args.num_targets)
    else:
        cfg = TrainConfig(model=preset, num_targets=args.num_targets,
                          compute_dtype="bfloat16")
        trainer = Trainer(cfg, args.model_dir, feat_dim=args.feat_dim)
        final = os.path.join(args.model_dir, "model_final")
        if os.path.exists(final):
            checkpoints.restore_into(trainer, os.path.realpath(final))
        elif checkpoints.latest_complete(args.model_dir) is None:
            sys.exit(f"no checkpoint under {args.model_dir}")
        else:
            checkpoints.restore_latest(trainer)

    if bool(args.feats_rspecifier) == bool(args.wav_rspecifier):
        sys.exit("pass exactly one of --feats-rspecifier/--wav-rspecifier")

    if args.wav_rspecifier:
        from ..extract.extractor import (WaveExtractor,
                                         WaveExtractorConfig, read_wav_scp)
        ex = WaveExtractor(
            trainer.model_cfg, trainer.params, trainer.state,
            WaveExtractorConfig(min_chunk=args.min_chunk_size,
                                max_chunk=args.chunk_size,
                                batch_size=args.batch_size,
                                compute_dtype=args.compute_dtype))

        def stream():
            wav_path = args.wav_rspecifier
            for pre in ("scp:", "scp,p:"):
                if wav_path.startswith(pre):
                    wav_path = wav_path[len(pre):]
            for i, (utt, wave) in enumerate(read_wav_scp(wav_path)):
                if args.num_shards > 1 and i % args.num_shards != args.shard:
                    continue
                yield utt, wave
    else:
        vad = (dict(kio.read_vec_flt_scp(args.vad_scp))
               if args.vad_scp else {})
        ex = XvectorExtractor(
            trainer.model_cfg, trainer.params, trainer.state,
            ExtractorConfig(min_chunk=args.min_chunk_size,
                            max_chunk=args.chunk_size,
                            batch_size=args.batch_size,
                            compute_dtype=args.compute_dtype))

        def stream():
            reader = (kio.read_mat_scp(args.feats_rspecifier)
                      if args.feats_rspecifier.startswith("scp")
                      else kio.read_mat_ark_fast(args.feats_rspecifier))
            for i, (utt, feats) in enumerate(reader):
                if args.num_shards > 1 and i % args.num_shards != args.shard:
                    continue
                if args.apply_cmvn or utt in vad:
                    feats = preprocess(feats, vad=vad.get(utt))
                yield utt, feats

    n = 0
    xvectors = {}
    with kio.ArkWriter(args.output_ark, scp) as w:
        for utt, xv in ex.extract_iter(stream()):
            w.write(utt, xv)
            if args.spk2utt:
                xvectors[utt] = xv
            n += 1
    if args.spk2utt:
        from ..extract.extractor import speaker_means
        utt2spk = {}
        for line in open(args.spk2utt):
            parts = line.split()
            for u in parts[1:]:
                utt2spk[u] = parts[0]
        means, counts = speaker_means(
            {u: v for u, v in xvectors.items() if u in utt2spk}, utt2spk)
        base = args.output_ark.replace(".ark", "")
        with kio.ArkWriter(base + "_spk.ark", base + "_spk.scp") as w:
            for spk in sorted(means):
                w.write(spk, means[spk])
        with open(base + "_num_utts.ark", "w") as f:
            for spk in sorted(counts):
                f.write(f"{spk} {counts[spk]}\n")
    open(scp + ".done", "w").close()
    print(f"wrote {n} x-vectors -> {args.output_ark}")


if __name__ == "__main__":
    main()
