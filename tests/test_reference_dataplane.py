"""Executed parity against the reference's pure-Python DATA PLANE.

Round 4 proved the model/optimizer/extraction layer against the
reference's own executed TF1 code (``test_reference_executed.py``); this
module applies the same technique to the data plane, which runs in this
environment unmodified and needs no TF:

  (a) the active egs allocator ``our_splitting_per_archive``
      (``create_egs.py:477-570``) is EXECUTED on a synthetic corpus and
      its written ranges/archive_minibatch_count/pdf2num artifacts are
      asserted BYTE-IDENTICAL to the plans our allocator produces in
      ``reference_semantics`` mode with the same seed — the two mirror
      the same Mersenne call sequence, so parity is exact, not
      statistical;
  (b) the ranges-file grammar is crossed both directions: the
      reference's ``process_range_file`` (``examples_io.py:12-38``)
      parses OUR ranges text, and our ``ArchivePlan.from_ranges_lines``
      parses the reference's written files back into the identical plan;
  (c) the archive materialiser is crossed at the byte level: the
      reference's own ``create_tar_files.process_files`` +
      ``examples_io`` pipeline dumps a tar FROM OUR ark bytes, which is
      then read by the reference's ``TarFileDataLoader`` and by our
      ``data.reference_tar`` reader (bit-identical sequences), and
      compared minibatch-for-minibatch against our plan-streamed
      minibatches (identical rows modulo the within-minibatch ordering
      the reference itself discards — it re-orders rows by scp iteration,
      ``examples_io.py:115-128``, and within-minibatch order is
      training-irrelevant);
  (d) the LR/dropout schedules are executed from ``ze_utils.py`` over a
      full recipe iteration grid and asserted exactly equal to
      ``train/schedules.py``.

Py3 shims (semantics-preserving, same spirit as test_reference_executed):
``sys.modules['thread'] = _thread`` for ze_utils' py2 import, and
``np.load(..., allow_pickle=True)`` when the reference loader reads the
dtype=object labels file its own writer produces (create_tar_files.py:133
pickles object arrays; modern numpy refuses them on load by default).
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import random
import sys
import types

import numpy as np
import pytest

from xvector_tpu.data import allocator as A
from xvector_tpu.data import archives as AR
from xvector_tpu.data import reference_tar as RT
from xvector_tpu.io import kaldi_ark as kio
from xvector_tpu.train import schedules as S

REF_TF_DIR = "/root/reference/local/tf"


@contextlib.contextmanager
def numpy2_load_shims():
    """Patch ``np.load`` for the 2018-era reference loaders under modern
    numpy — both shims value-preserving: (a) ``allow_pickle=True`` for
    path loads (the reference's own labels writer pickles a dtype=object
    array, create_tar_files.py:133, which numpy 2.x refuses by default);
    (b) a BytesIO hop for file-object loads (np.load probes ``.fileno()``
    on tarfile member objects — AttributeError under py3.12).  Shared by
    the tar round-trip, capstone-iteration, and eval-CLI parity tests."""
    orig_load = np.load

    def shim_load(*a, **k):
        if a and isinstance(a[0], str):
            return orig_load(*a, **{**k, "allow_pickle": True})
        if a and hasattr(a[0], "read") and not isinstance(a[0], io.BytesIO):
            return orig_load(io.BytesIO(a[0].read()), *a[1:], **k)
        return orig_load(*a, **k)

    np.load = shim_load
    try:
        yield
    finally:
        np.load = orig_load


def _load_ref(name: str, alias: str | None = None):
    path = os.path.join(REF_TF_DIR, name + ".py")
    if not os.path.exists(path):
        pytest.skip("reference tree not present")
    spec = importlib.util.spec_from_file_location(alias or ("ref_" + name),
                                                 path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_dataplane():
    """Import the reference's pure-Python data plane (also used by the
    capstone iteration test in test_reference_executed.py)."""
    import _thread
    sys.modules.setdefault("thread", _thread)
    ce = _load_ref("create_egs")
    # examples_io does `import kaldi_io` — satisfy it with the reference's
    # own vendored reader under its expected module name
    if "kaldi_io" not in sys.modules:
        _load_ref("kaldi_io", alias="kaldi_io")
    # create_tar_files imports examples_io / ze_utils by their plain
    # names — register them under both
    eio = sys.modules.setdefault("examples_io", _load_ref("examples_io"))
    zu = sys.modules.setdefault("ze_utils", _load_ref("ze_utils"))
    ctf = _load_ref("create_tar_files")
    return types.SimpleNamespace(ce=ce, eio=eio, zu=zu, ctf=ctf)


@pytest.fixture(scope="module")
def ref():
    return load_ref_dataplane()


# ---------------------------------------------------------------------------
# Corpus: augmentation suffixes (with and without a present base), an
# inner-dash id, short utterances (< min chunk length, exercising the
# reference's consume-and-redraw loop), single-utterance speakers.
# ---------------------------------------------------------------------------

def _corpus():
    rng = random.Random(99)
    utt2len: dict[str, int] = {}
    utt2spk: dict[str, int] = {}

    def add(utt, spk, n):
        utt2len[utt] = n
        utt2spk[utt] = spk

    for s in range(6):
        for k in range(3):
            add(f"spk{s}_utt{k}", s, rng.randint(150, 600))
        add(f"spk{s}_utt0-noise", s, utt2len[f"spk{s}_utt0"])
        add(f"spk{s}_utt1-babble", s, utt2len[f"spk{s}_utt1"])
    add("spk0_utt9-reverb", 0, 300)     # suffixed, base absent
    add("spk1-extra", 1, 250)           # inner dash, "spk1" not a key
    add("spk2_short", 2, 40)            # below min chunk length
    add("spk3_short", 3, 55)
    return utt2len, utt2spk


def _write_corpus(tmp, utt2len, utt2spk):
    u2l = tmp / "utt2len.train"
    u2i = tmp / "utt2int.train"
    u2l.write_text("".join(f"{u} {n}\n" for u, n in utt2len.items()))
    u2i.write_text("".join(f"{u} {s}\n" for u, s in utt2spk.items()))
    return str(u2l), str(u2i)


_PARAMS = dict(min_frames=60, max_frames=120, minibatch_size=8,
               accepted_overlap=0.2, seed=31337)


def _run_reference_alloc(ref, tmp, utt2len_path, utt2int_path,
                         num_repeats, frames_per_iter, num_archives,
                         num_jobs=2, params=None):
    p = params or _PARAMS
    args = types.SimpleNamespace(
        prefix="", num_repeats=num_repeats,
        min_frames_per_chunk=p["min_frames"],
        max_frames_per_chunk=p["max_frames"],
        randomize_chunk_length="true", frames_per_iter=frames_per_iter,
        num_archives=num_archives, num_jobs=num_jobs,
        seed=p["seed"], accepted_overlap=p["accepted_overlap"],
        minibatch_size=p["minibatch_size"],
        utt2len_filename=utt2len_path, utt2int_filename=utt2int_path,
        egs_dir=str(tmp))
    os.makedirs(str(tmp / "temp"), exist_ok=True)
    # the reference's main() sequence (create_egs.py:573-587): seed the
    # global RNG, parse the two files with the reference's own parsers,
    # derive num_pdfs, run the active strategy
    random.seed(args.seed)
    utt2len = ref.ce.get_utt2len(args.utt2len_filename)
    spks, spk2utt, utt2spk = ref.ce.get_labels(args.utt2int_filename)
    args.num_pdfs = max(spks) + 1
    ref.ce.our_splitting_per_archive(args, spk2utt, utt2spk, utt2len, "")
    return args


def _our_plans(utt2len, utt2spk, num_repeats, frames_per_iter,
               num_archives, params=None):
    p = params or _PARAMS
    cfg = A.AllocatorConfig(
        min_frames=p["min_frames"], max_frames=p["max_frames"],
        minibatch_size=p["minibatch_size"], num_repeats=num_repeats,
        frames_per_iter=frames_per_iter,
        accepted_overlap=p["accepted_overlap"],
        length_bucket=1, snap_to_bucket=False, seed=p["seed"],
        reference_semantics=True)
    return list(A.allocate_archives(utt2len, utt2spk, cfg,
                                    num_archives=num_archives))


def _plan_ranges_text(plan, utt2spk):
    """Reference file image of a plan: rows sorted the way the reference
    sorts before writing (create_egs.py:537, lexicographic on the
    (utt, mb, rel, offset, length) tuple)."""
    rows = sorted((c.utt, mb_i, rel, c.offset, c.length)
                  for mb_i, mb in enumerate(plan.minibatches)
                  for rel, c in enumerate(mb.chunks))
    return "".join(f"{u} {m} {r} {o} {ln} {utt2spk[u]}\n"
                   for u, m, r, o, ln in rows)


@pytest.mark.parametrize("num_repeats,frames_per_iter", [
    (20, 3000),        # stops on the frames-per-iter target
    (6, 10 ** 7),      # stops on draw-pool exhaustion
], ids=["frames_bound", "pool_bound"])
def test_allocator_bit_exact_vs_executed_reference(ref, tmp_path,
                                                   num_repeats,
                                                   frames_per_iter):
    utt2len, utt2spk = _corpus()
    u2l, u2i = _write_corpus(tmp_path, utt2len, utt2spk)
    n_arch = 3
    _run_reference_alloc(ref, tmp_path, u2l, u2i, num_repeats,
                         frames_per_iter, n_arch)
    plans = _our_plans(utt2len, utt2spk, num_repeats, frames_per_iter,
                       n_arch)
    assert len(plans) == n_arch
    counts = (tmp_path / "temp" / "archive_minibatch_count").read_text()
    assert counts == "".join(f"{i + 1} {len(p.minibatches)}\n"
                             for i, p in enumerate(plans))
    for i, plan in enumerate(plans):
        assert plan.minibatches, f"archive {i} planned empty"
        got = (tmp_path / "temp" / f"ranges.{i + 1}").read_text()
        assert got == _plan_ranges_text(plan, utt2spk), \
            f"archive {i} plan diverges from the executed reference"
    # pdf2num: per-label chunk counts across all archives
    # (create_egs.py:561-570)
    n_pdfs = max(utt2spk.values()) + 1
    ours = [0] * n_pdfs
    for p in plans:
        for mb in p.minibatches:
            for c in mb.chunks:
                ours[c.label] += 1
    assert (tmp_path / "pdf2num").read_text().split() \
        == [str(v) for v in ours]


def test_reference_ranges_rebuild_to_identical_plan(ref, tmp_path):
    """Our ranges parser must rebuild the reference's written file into a
    plan equal (dataclass equality) to the one our exact mode produced."""
    utt2len, utt2spk = _corpus()
    u2l, u2i = _write_corpus(tmp_path, utt2len, utt2spk)
    _run_reference_alloc(ref, tmp_path, u2l, u2i, 20, 3000, 2)
    plans = _our_plans(utt2len, utt2spk, 20, 3000, 2)
    for i, plan in enumerate(plans):
        lines = (tmp_path / "temp" / f"ranges.{i + 1}").read_text() \
            .splitlines()
        rebuilt = A.ArchivePlan.from_ranges_lines(i, lines, length_bucket=1)
        assert rebuilt == plan


def test_reference_parser_reads_our_ranges(ref, tmp_path):
    """Both grammar directions: the reference's process_range_file
    (examples_io.py:12-38) parses OUR ranges text — from the DEFAULT
    (TPU-bucketed) allocator, not just reference mode — into consistent
    chunk maps, passing its own minibatch-shape assertions."""
    utt2len, utt2spk = _corpus()
    cfg = A.AllocatorConfig(min_frames=60, max_frames=120, minibatch_size=8,
                            num_repeats=10, frames_per_iter=2500,
                            length_bucket=16, snap_to_bucket=True, seed=7)
    plan = next(iter(A.allocate_archives(utt2len, utt2spk, cfg,
                                         num_archives=1)))
    path = tmp_path / "ranges.1"
    path.write_text("".join(ln + "\n" for ln in plan.to_ranges_lines()))
    utt_to_chunks, minibatch_info = ref.eio.process_range_file(
        str(path), len(plan.minibatches), cfg.minibatch_size)
    total = sum(len(v) for v in utt_to_chunks.values())
    assert total == sum(len(mb.chunks) for mb in plan.minibatches)
    for mb_i, mb in enumerate(plan.minibatches):
        # [total_len, segment_len, fill-counter] (examples_io.py:27-31)
        assert minibatch_info[mb_i][1] == mb.length
        assert minibatch_info[mb_i][0] == mb.length * len(mb.chunks)
    for utt, chunks in utt_to_chunks.items():
        for mb_i, off, ln, lab in chunks:
            assert lab == utt2spk[utt]
            assert 0 <= off <= utt2len[utt] - ln


def test_overlap_predicate_matches_reference_executed(ref):
    """Fuzz our acceptance predicate against the reference's
    __overlap_is_ok (create_egs.py:247-253) over mixed-length histories —
    the regime where distance-based and intersection-based rules diverge,
    so only an exact mirror passes."""
    rng = random.Random(5)
    checked = agreed = 0
    for _ in range(4000):
        a = rng.choice([0.0, 0.2, 0.5])
        length = rng.randint(50, 400)
        used = [(rng.randint(0, 800), rng.randint(50, 400))
                for _ in range(rng.randint(0, 4))]
        off = rng.randint(0, 800)
        want = ref.ce.__dict__["__overlap_is_ok"](off, used, length, a)
        got = A._reference_offset_ok(off, used, length, a)
        checked += 1
        agreed += int(want == got)
        assert want == got, (off, used, length, a)
    assert checked == 4000 and agreed == checked


def test_schedules_match_executed_reference(ref):
    """ze_utils.get_learning_rate (ze_utils.py:111-120) and
    get_dropout_edit_string (:428-443) executed over the full recipe
    iteration grid vs train/schedules.py — exact float equality (same
    pure-Python formula must produce the same bits)."""
    init, final = 1e-3, 1e-4          # run_xvector.sh:60-61
    num_archives, num_repeats, num_jobs_grid = 169, 35, (2, 4, 8)
    num_epochs = 3
    num_archives_to_process = num_archives * num_epochs
    for num_jobs in num_jobs_grid:
        num_iters = num_archives_to_process // num_jobs
        processed = 0
        for it in range(num_iters):
            want = ref.zu.get_learning_rate(
                it, num_jobs, num_iters, processed,
                num_archives_to_process, init, final)
            got = S.learning_rate(processed, num_archives_to_process,
                                  init, final, num_jobs=num_jobs,
                                  is_final_iter=(it + 1 >= num_iters))
            assert got == want, (num_jobs, it)
            processed += num_jobs

    for sched in ("0,0@0.10,0.1@0.50,0",      # run_xvector.sh:83
                  "0,0.5,0",                   # bare interior (=@0.5)
                  "0.1,0.3@0.25,0.3@0.75,0.0",  # plateau
                  "0,0@0.20,0.5@0.20,0"):      # step: duplicated fraction
        pts = S.parse_dropout_schedule(sched)
        for frac in [i / 200 for i in range(201)]:
            want = ref.zu.get_dropout_edit_string(sched, frac)
            got = S.dropout_proportion(pts, frac)
            assert got == pytest.approx(want, abs=0.0), (sched, frac)


# ---------------------------------------------------------------------------
# Archive materialisation: reference tar pipeline executed on our ark
# bytes, crossed against our loaders and our plan-streamed minibatches.
# ---------------------------------------------------------------------------

def _write_feats(tmp_path, utt2len, feat_dim=23):
    rng = np.random.RandomState(17)
    feats = {u: rng.randn(n, feat_dim).astype(np.float32) * 2.0
             for u, n in utt2len.items()}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    with kio.ArkWriter(ark, scp) as w:
        for u, m in feats.items():
            w.write(u, m)
    return feats, ark, scp


def test_reference_tar_pipeline_crossed(ref, tmp_path):
    utt2len, utt2spk = _corpus()
    u2l, u2i = _write_corpus(tmp_path, utt2len, utt2spk)
    _run_reference_alloc(ref, tmp_path, u2l, u2i, 20, 3000, 1, num_jobs=1)
    [plan] = _our_plans(utt2len, utt2spk, 20, 3000, 1)
    feats, ark, scp = _write_feats(tmp_path, utt2len)

    # per-archive filtered scp, as get_egs.sh stages it (utils/filter_scp)
    used = sorted({c.utt for mb in plan.minibatches for c in mb.chunks})
    scp_lines = {ln.split(" ")[0]: ln
                 for ln in open(scp).read().splitlines()}
    (tmp_path / "temp" / "feats.scp.1").write_text(
        "".join(scp_lines[u] + "\n" for u in used))
    outputs = tmp_path / "temp" / "outputs.1"
    outputs.write_text("egs.1.tar\n")

    # EXECUTE the reference materialiser end-to-end on our ark bytes
    args = types.SimpleNamespace(prefix="", egs_dir=str(tmp_path),
                                 shuffle=False, random_seed=0,
                                 feature_dim=23,
                                 minibatch_size=_PARAMS["minibatch_size"],
                                 outputs_file=str(outputs))
    ref.ctf.process_files(args)
    tar_path = str(tmp_path / "egs.1.tar")
    assert os.path.exists(tar_path) and os.path.exists(
        str(tmp_path / "egs.1.npy"))

    # (1) reference TarFileDataLoader vs our reader: bit-identical
    # sequences (numpy2_load_shims: the two value-preserving np.load
    # patches the 2018-era loader needs under modern numpy).
    with numpy2_load_shims():
        loader = ref.eio.TarFileDataLoader(tar_path)
        ref_seq = [loader.pop() for _ in range(loader.count)]
    our_seq = list(RT.read_reference_tar(tar_path))
    assert len(ref_seq) == len(our_seq) == len(plan.minibatches)
    for (rm, rl), (om, ol) in zip(ref_seq, our_seq):
        assert rm.dtype == om.dtype == np.float16
        np.testing.assert_array_equal(rm, om)
        np.testing.assert_array_equal(np.asarray(rl, np.int32), ol)

    # (2) our plan-streamed minibatches vs the reference tar: identical
    # rows modulo within-minibatch order (the reference re-orders rows by
    # scp iteration, examples_io.py:115-128, discarding the planned
    # relative index; row order within a minibatch is training-irrelevant)
    ours = list(AR.iter_plan_minibatches(plan, fetch=lambda u: feats[u]))
    assert len(ours) == len(ref_seq)
    for (rm, rl), (om, ol, true_len) in zip(ref_seq, ours):
        assert rm.shape == om.shape and true_len == rm.shape[1]
        key = lambda pair: pair[0].tobytes() + int(pair[1]).to_bytes(4, "little")  # noqa: E731
        ref_rows = sorted(zip(rm, np.asarray(rl)), key=key)
        our_rows = sorted(zip(om, ol), key=key)
        for (ra, rb), (oa, ob) in zip(ref_rows, our_rows):
            np.testing.assert_array_equal(ra, oa)
            assert int(rb) == int(ob)

    # (3) reverse direction: OUR writer → reference loader, exact.
    # Note: no allow_pickle needed — our labels file is a plain int32
    # array; only the fileno shim applies.
    tar2 = str(tmp_path / "ours.1.tar")
    RT.write_reference_tar(tar2, [(m, l) for m, l, _ in ours])
    with numpy2_load_shims():
        loader2 = ref.eio.TarFileDataLoader(tar2)
        for om, ol, _ in ours:
            rm, rl = loader2.pop()
            np.testing.assert_array_equal(rm, om.astype(np.float16))
            np.testing.assert_array_equal(np.asarray(rl, np.int32),
                                          np.asarray(ol, np.int32))


def test_default_allocator_distribution_matches_reference(ref, tmp_path):
    """The production (TPU-bucketed) path is NOT RNG-exact; assert its
    sampling statistics track the executed reference on the same corpus:
    per-speaker draw shares and offset coverage."""
    utt2len, utt2spk = _corpus()
    u2l, u2i = _write_corpus(tmp_path, utt2len, utt2spk)
    _run_reference_alloc(ref, tmp_path, u2l, u2i, 20, 3000, 3)
    ref_rows = []
    for i in range(3):
        for ln in (tmp_path / "temp" / f"ranges.{i + 1}").read_text() \
                .splitlines():
            p = ln.split()
            ref_rows.append((p[0], int(p[3]), int(p[4]), int(p[5])))
    cfg = A.AllocatorConfig(min_frames=60, max_frames=120, minibatch_size=8,
                            num_repeats=20, frames_per_iter=3000,
                            length_bucket=16, snap_to_bucket=True, seed=5)
    our_rows = [(c.utt, c.offset, c.length, c.label)
                for plan in A.allocate_archives(utt2len, utt2spk, cfg,
                                                num_archives=3)
                for mb in plan.minibatches for c in mb.chunks]

    def spk_share(rows):
        n = np.zeros(6)
        for r in rows:
            n[r[-1]] += 1
        return n / n.sum()

    # speaker-balance: both draw speakers uniformly from repeat pools
    assert np.abs(spk_share(ref_rows) - spk_share(our_rows)).max() < 0.08
    # offset coverage: chunks spread over utterances, not pinned at 0
    for rows, off_i, len_i in ((ref_rows, 1, 2), (our_rows, 1, 2)):
        offs = np.asarray([r[off_i] for r in rows], float)
        lens = np.asarray([r[len_i] for r in rows], float)
        caps = np.asarray([utt2len[r[0]] for r in rows], float) - lens
        frac = offs[caps > 0] / caps[caps > 0]
        assert 0.25 < frac.mean() < 0.75 and frac.std() > 0.15
