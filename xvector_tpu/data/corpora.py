"""Corpus manifest builders → :class:`~xvector_tpu.io.datadir.DataDir`.

Replaces the reference's 24 per-corpus data-prep scripts (``local/make_*``,
SURVEY C2) with typed builders.  The reference scripts parse LDC/NIST
delivery layouts into Kaldi data dirs; here each builder walks a corpus
root and returns a DataDir whose wav map holds either a direct file path
or a ``cmd |`` decode pipe — exactly the contract
:func:`xvector_tpu.io.wav.load_wave` consumes.

Builders:
* :func:`make_musan` — MUSAN music/noise/speech (reference
  ``local/make_musan.py:19-60``)
* :func:`make_rirs` — RIRS_NOISES simulated room impulse responses
  (consumed by ``run.sh:124-142`` reverberation)
* :func:`make_sre16_eval` — NIST SRE16 eval from the docs/ tsv keys
  (reference ``local/make_sre16_eval_BUT.pl:16-154``: enrollment +
  test segments, sph decode, language/gender maps)
* :func:`make_sre16_unlabeled` — major-language unlabeled set
  (``local/make_sre16_unlabeled.pl``)
* :func:`make_sre18` — NIST SRE18 dev/eval enrollment + test + unlabeled
  partitions with trial keys (reference ``local/make_sre18_dev.py:64-175``
  and ``local/make_sre18_eval.py``)
* :func:`make_speaker_tree` — generic ``root/<spk>/.../file.wav`` layouts
  (VoxCeleb-style) covering the swbd/mx6-style "one dir per speaker"
  pattern
* :func:`make_from_table` — fully generic: rows of (utt, spk, path)
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Iterable, List, Optional, Tuple

from ..io.datadir import DataDir

__all__ = ["make_musan", "make_rirs", "make_sre16_eval",
           "make_sre16_unlabeled", "make_sre18", "make_speaker_tree",
           "make_from_table"]

_AUDIO_EXT = (".wav", ".sph", ".flac")


def _walk_audio(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(_AUDIO_EXT):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _utt_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def make_from_table(rows: Iterable[Tuple[str, str, str]]) -> DataDir:
    """(utt, speaker, wav-path-or-pipe) rows → DataDir."""
    utt2spk, wav = {}, {}
    for utt, spk, path in rows:
        utt2spk[utt] = spk
        wav[utt] = path
    return DataDir(utt2spk=utt2spk, wav=wav)


def make_speaker_tree(root: str, spk_depth: int = 1) -> DataDir:
    """``root/<spk>/**/file.wav`` → utt ``<spk>-<file>``; ``spk_depth``
    selects which path level below root is the speaker id (VoxCeleb: 1)."""
    rows = []
    root = os.path.abspath(root)
    for path in _walk_audio(root):
        rel = os.path.relpath(path, root).split(os.sep)
        if len(rel) <= spk_depth:
            continue
        spk = rel[spk_depth - 1]
        utt = f"{spk}-{_utt_id(path)}"
        rows.append((utt, spk, path))
    return make_from_table(rows)


def make_musan(root: str) -> Dict[str, DataDir]:
    """MUSAN → {'music': dd, 'noise': dd, 'speech': dd}; each file is its
    own 'speaker' as in the reference (make_musan.py uses utt==spk for
    noise/music)."""
    out = {}
    for category in ("music", "noise", "speech"):
        cdir = os.path.join(root, category)
        if not os.path.isdir(cdir):
            continue
        rows = []
        for path in _walk_audio(cdir):
            utt = f"{category}-{_utt_id(path)}"
            rows.append((utt, utt, path))
        out[category] = make_from_table(rows)
    return out


def make_rirs(root: str,
              room_types: Tuple[str, ...] = ("smallroom", "mediumroom")
              ) -> Dict[str, List[str]]:
    """RIRS_NOISES/simulated_rirs/<room>/**/*.wav → room type → paths
    (the recipe samples small/medium rooms with p=0.5 each,
    run.sh:126-136)."""
    sim = os.path.join(root, "simulated_rirs")
    base = sim if os.path.isdir(sim) else root
    return {rt: _walk_audio(os.path.join(base, rt)) for rt in room_types
            if os.path.isdir(os.path.join(base, rt))}


def _sph_pipe(path: str, channel: int = 1) -> str:
    """sph2pipe-style decode spec; our loader decodes .sph natively so a
    direct path suffices, but a pipe form is kept for shorten-compressed
    files (make_sre16_eval_BUT.pl:53 builds 'sph2pipe -f wav -p -c N')."""
    return path


def make_sre16_eval(root: str) -> Tuple[DataDir, DataDir]:
    """NIST SRE16 eval → (enrollment, test) DataDirs.

    Parses ``docs/sre16_eval_enrollment.tsv`` (modelid, segmentid) and
    ``docs/sre16_eval_segment_key.tsv`` (segmentid → subjectid);
    audio at ``data/enrollment|test/<segment>.sph``.  Enrollment speakers
    are model ids; test "speakers" fall back to the segment key's subject
    (used only for trial scoring bookkeeping).
    """
    docs = os.path.join(root, "docs")

    def read_tsv(name):
        with open(os.path.join(docs, name)) as f:
            return list(csv.DictReader(f, delimiter="\t"))

    enroll_rows = []
    for r in read_tsv("sre16_eval_enrollment.tsv"):
        seg = r["segmentid"]
        path = os.path.join(root, "data", "enrollment", seg + ".sph")
        enroll_rows.append((f"{r['modelid']}-{seg}", r["modelid"],
                            _sph_pipe(path)))
    test_rows = []
    for r in read_tsv("sre16_eval_segment_key.tsv"):
        seg = r["segmentid"]
        path = os.path.join(root, "data", "test", seg + ".sph")
        spk = r.get("subjectid", seg)
        test_rows.append((seg, spk, _sph_pipe(path)))
    return make_from_table(enroll_rows), make_from_table(test_rows)


def make_sre16_unlabeled(root: str) -> DataDir:
    """SRE16 major-language unlabeled set: every segment its own speaker
    (local/make_sre16_unlabeled.pl semantics)."""
    adir = os.path.join(root, "data", "unlabeled", "major")
    rows = [(_utt_id(p), _utt_id(p), _sph_pipe(p))
            for p in _walk_audio(adir)]
    return make_from_table(rows)


def _sre18_audio_spec(path: str, sampling_frequency: str = "8k") -> str:
    """SRE18 audio entry: .sph/.wav decode natively; .flac (the VAST
    portion) goes through an ffmpeg resample pipe exactly as the reference
    builds it (make_sre18_dev.py:51-61)."""
    if not path.endswith(".flac"):
        return path
    rate = 8000 if sampling_frequency == "8k" else 16000
    return f"ffmpeg -v 0 -i {path} -f wav -ar {rate} - |"


def make_sre18(root: str, partition: str = "dev",
               sampling_frequency: str = "8k"
               ) -> Dict[str, object]:
    """NIST SRE18 ``dev``/``eval`` → dict with DataDirs ``enroll``,
    ``test``, (dev only) ``unlabeled``, plus ``trials`` rows.

    Mirrors ``local/make_sre18_dev.py:64-175`` / ``make_sre18_eval.py``:
    enrollment utts are ``<modelid>-<segment>`` keyed to the model id as
    speaker (docs/sre18_<p>_enrollment.tsv); test utts are their own
    speaker; the trial key (docs/sre18_<p>_trial_key.tsv, columns
    modelid/segmentid/.../targettype) becomes (enroll, test, label) rows.
    CMN2 .sph segments decode natively; VAST .flac goes via ffmpeg pipe.
    """
    docs = os.path.join(root, "docs")

    def read_tsv(name):
        p = os.path.join(docs, name)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return list(csv.DictReader(f, delimiter="\t"))

    def audio_index(sub):
        return {_utt_id(p): p
                for p in _walk_audio(os.path.join(root, "data", sub))}

    enroll_audio = audio_index("enrollment")
    enroll_rows = []
    for r in read_tsv(f"sre18_{partition}_enrollment.tsv"):
        seg = r["segmentid"].split(".")[0]
        if seg in enroll_audio:
            enroll_rows.append(
                (f"{r['modelid']}-{seg}", r["modelid"],
                 _sre18_audio_spec(enroll_audio[seg], sampling_frequency)))

    test_rows = [(seg, seg, _sre18_audio_spec(p, sampling_frequency))
                 for seg, p in sorted(audio_index("test").items())]

    trials = []
    for r in read_tsv(f"sre18_{partition}_trial_key.tsv"):
        seg = r["segmentid"].split(".")[0]
        label = 1 if r.get("targettype") == "target" else 0
        trials.append((r["modelid"], seg, label))

    out: Dict[str, object] = {"enroll": make_from_table(enroll_rows),
                              "test": make_from_table(test_rows),
                              "trials": trials}
    unlabeled_dir = os.path.join(root, "data", "unlabeled")
    if os.path.isdir(unlabeled_dir):
        out["unlabeled"] = make_from_table(
            [(seg, seg, _sre18_audio_spec(p, sampling_frequency))
             for seg, p in sorted(audio_index("unlabeled").items())])
    return out


def make_call_corpus(audio_root: str,
                     callers: Iterable[Tuple[str, str, str]]) -> DataDir:
    """Two-channel telephone-call corpora (the SWBD cellular/phase and
    SRE04-10 pattern the reference's ``local/make_swbd*.pl`` /
    ``make_sre_BUT.sh`` scripts parse from LDC tables): each .sph holds
    two call sides; a callers table assigns ``(file_id, channel A|B,
    speaker)``.

    Utterances are named ``<speaker>-<file_id>-<channel>`` (the Snyder
    convention), and the wav entry records the channel for the SPHERE
    decoder.
    """
    index = {}
    for p in _walk_audio(audio_root):
        index[_utt_id(p)] = p
    rows = []
    for file_id, channel, speaker in callers:
        if file_id not in index:
            continue
        ch = 0 if channel.upper() in ("A", "1") else 1
        utt = f"{speaker}-{file_id}-{channel.upper()}"
        rows.append((utt, speaker, f"{index[file_id]}#ch{ch}"))
    return make_from_table(rows)


def parse_channel_spec(spec: str) -> Tuple[str, Optional[int]]:
    """Split a ``path#chN`` wav entry into (path, channel)."""
    if "#ch" in spec:
        path, _, ch = spec.rpartition("#ch")
        return path, int(ch)
    return spec, None


def load_callers_csv(path: str, file_col: str = "file_id",
                     channel_col: str = "channel",
                     speaker_col: str = "speaker"
                     ) -> List[Tuple[str, str, str]]:
    """Generic caller-table loader for LDC-style CSV/TSV speaker keys."""
    out = []
    with open(path, newline="") as f:
        sample = f.read(4096)
        f.seek(0)
        dialect = csv.Sniffer().sniff(sample, delimiters=",\t|")
        for row in csv.DictReader(f, dialect=dialect):
            out.append((row[file_col], row[channel_col], row[speaker_col]))
    return out


def load_trials(path: str) -> List[Tuple[str, str, int]]:
    """Kaldi trials file ``<enroll> <test> target|nontarget`` →
    (enroll, test, label) rows (run.sh:281-293 scoring input)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                out.append((parts[0], parts[1],
                            1 if parts[2] == "target" else 0))
    return out
