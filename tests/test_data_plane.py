"""Chunk allocator property tests (speaker balance, overlap control,
coverage invariants per create_egs.py semantics) + archive round-trips."""

import collections
import os

import numpy as np
import pytest

from xvector_tpu.data import allocator as A
from xvector_tpu.data import archives as AR


def _toy_corpus(num_spk=6, utts_per_spk=4, min_len=500, seed=0):
    rng = np.random.RandomState(seed)
    utt2len, utt2label = {}, {}
    for s in range(num_spk):
        for u in range(utts_per_spk):
            name = f"s{s}_u{u}"
            utt2len[name] = int(min_len + rng.randint(0, 500))
            utt2label[name] = s
    return utt2len, utt2label


CFG = A.AllocatorConfig(min_frames=100, max_frames=200, minibatch_size=8,
                        num_repeats=4, frames_per_iter=50_000, seed=1)


def test_allocator_chunk_invariants():
    utt2len, utt2label = _toy_corpus()
    plans = list(A.allocate_archives(utt2len, utt2label, CFG,
                                     num_archives=2))
    assert len(plans) == 2
    for plan in plans:
        assert plan.frames > 0
        for mb in plan.minibatches:
            assert len(mb.chunks) == CFG.minibatch_size
            assert CFG.min_frames <= mb.length <= CFG.max_frames
            assert mb.padded_length % CFG.length_bucket == 0
            assert mb.padded_length >= mb.length
            for c in mb.chunks:
                assert c.length == mb.length     # one length per minibatch
                assert 0 <= c.offset
                assert c.offset + c.length <= utt2len[c.utt]
                assert c.label == utt2label[c.utt]


def test_allocator_speaker_balance():
    """Each speaker's draw count stays within a tolerance of num_repeats
    per archive (the reference's repeated-shuffled-pool guarantee)."""
    utt2len, utt2label = _toy_corpus(num_spk=10)
    (plan,) = A.allocate_archives(utt2len, utt2label, CFG, num_archives=1)
    counts = collections.Counter(c.label for mb in plan.minibatches
                                 for c in mb.chunks)
    total = sum(counts.values())
    expect = total / 10
    for spk in range(10):
        assert counts[spk] >= 0.5 * expect
        assert counts[spk] <= 2.0 * expect


def test_allocator_determinism():
    utt2len, utt2label = _toy_corpus()
    p1 = list(A.allocate_archives(utt2len, utt2label, CFG, num_archives=1))
    p2 = list(A.allocate_archives(utt2len, utt2label, CFG, num_archives=1))
    assert p1 == p2


def test_allocator_ranges_format():
    utt2len, utt2label = _toy_corpus()
    (plan,) = A.allocate_archives(utt2len, utt2label, CFG, num_archives=1)
    lines = plan.to_ranges_lines()
    utt, mb, rel, off, ln, lab = lines[0].split()
    assert utt in utt2len
    assert int(ln) == plan.minibatches[0].length


def test_base_utt_strips_augmentation():
    assert A.base_utt("sre_1234-noise") == "sre_1234"
    assert A.base_utt("sre_1234-reverb") == "sre_1234"
    assert A.base_utt("sre_1234-babble") == "sre_1234"
    assert A.base_utt("sre_1234-music") == "sre_1234"
    assert A.base_utt("sre_1234") == "sre_1234"
    assert A.base_utt("sre-A-5") == "sre-A-5"   # non-aug dash survives


def test_allocator_overlap_control():
    """With a single long utterance per speaker, planned chunks should
    mostly respect the accepted-overlap bound against each other."""
    utt2len = {"s0_u0": 100_000}
    utt2label = {"s0_u0": 0}
    cfg = A.AllocatorConfig(min_frames=100, max_frames=100,
                            minibatch_size=4, num_repeats=8,
                            frames_per_iter=4_000, seed=3,
                            accepted_overlap=0.0, length_bucket=1)
    (plan,) = A.allocate_archives(utt2len, utt2label, cfg, num_archives=1)
    spans = [(c.offset, c.offset + c.length) for mb in plan.minibatches
             for c in mb.chunks]
    overlapping = 0
    for i, (s1, e1) in enumerate(spans):
        for s2, e2 in spans[i + 1:]:
            if min(e1, e2) - max(s1, s2) > 0:
                overlapping += 1
    # plenty of room for 40 disjoint chunks of 100 in 100k frames
    assert overlapping <= len(spans) // 10


def test_archive_roundtrip(tmp_path):
    mbs = []
    rng = np.random.RandomState(0)
    for i in range(3):
        x = rng.randn(4, 96 + 32 * i, 23).astype(np.float16)
        y = rng.randint(0, 10, size=4).astype(np.int32)
        mbs.append((x, y, 90 + 32 * i))
    path = str(tmp_path / "egs.1.xta")
    AR.write_archive(path, mbs)
    with AR.ArchiveReader(path) as r:
        assert len(r) == 3
        for i, (x, y, t) in enumerate(r):
            np.testing.assert_array_equal(x, mbs[i][0])
            np.testing.assert_array_equal(y, mbs[i][1])
            assert t == mbs[i][2]


def test_materialize_and_prefetch(tmp_path):
    utt2len, utt2label = _toy_corpus(num_spk=3, utts_per_spk=2)
    cfg = A.AllocatorConfig(min_frames=50, max_frames=80, minibatch_size=4,
                            num_repeats=2, frames_per_iter=2_000, seed=5)
    (plan,) = A.allocate_archives(utt2len, utt2label, cfg, num_archives=1)
    feats = {u: np.random.RandomState(hash(u) % 2**31).randn(
        n, 23).astype(np.float32) for u, n in utt2len.items()}
    path = str(tmp_path / "egs.0.xta")
    AR.materialize_archive(plan, path, fetch=lambda u: feats[u],
                           shuffle_seed=7)
    # idempotent: second call must be a no-op
    mtime = os.path.getmtime(path)
    AR.materialize_archive(plan, path, fetch=lambda u: 1 / 0)
    assert os.path.getmtime(path) == mtime

    with AR.ArchiveReader(path) as r:
        loader = AR.PrefetchLoader(r, queue_size=2)
        seen = 0
        for x, y, true_len in loader:
            assert x.dtype == np.float16   # upload bytes as stored on disk
            assert 0 < true_len <= x.shape[1]
            # feature rows beyond true length are zero padding
            if true_len < x.shape[1]:
                assert np.abs(x[:, true_len:].astype(np.float32)).max() == 0
            seen += 1
        assert seen == len(plan.minibatches)


def test_materialized_content_matches_source(tmp_path):
    """Chunk i of minibatch j must equal the planned slice of the source
    feature matrix (up to fp16 rounding)."""
    utt2len = {"a": 300, "b": 280}
    utt2label = {"a": 0, "b": 1}
    cfg = A.AllocatorConfig(min_frames=64, max_frames=64, minibatch_size=2,
                            num_repeats=2, frames_per_iter=512, seed=9,
                            length_bucket=64)
    (plan,) = A.allocate_archives(utt2len, utt2label, cfg, num_archives=1)
    feats = {u: np.random.RandomState(i).randn(n, 5).astype(np.float32)
             for i, (u, n) in enumerate(utt2len.items())}
    path = str(tmp_path / "m.xta")
    AR.materialize_archive(plan, path, fetch=lambda u: feats[u])
    with AR.ArchiveReader(path) as r:
        for mb, (x, y, t) in zip(plan.minibatches, r):
            for i, c in enumerate(mb.chunks):
                want = feats[c.utt][c.offset: c.offset + c.length]
                np.testing.assert_allclose(x[i, : c.length], want,
                                           atol=2e-3)


def test_deterministic_length_strategy():
    from xvector_tpu.data.allocator import deterministic_chunk_length
    # reference formula endpoints (create_egs.py:223-231)
    assert deterministic_chunk_length(0, 5, 200, 400) == 200
    assert deterministic_chunk_length(4, 5, 200, 400) == 400
    assert deterministic_chunk_length(2, 5, 200, 400) == \
        int((400 / 200) ** 0.5 * 200 + 0.5)
    assert deterministic_chunk_length(3, 1, 200, 400) == 400
    assert deterministic_chunk_length(1, 9, 300, 300) == 300

    utt2len, utt2label = _toy_corpus()
    # snap_to_bucket off: this test asserts the reference FORMULA values
    cfg2 = A.AllocatorConfig(min_frames=100, max_frames=200,
                             minibatch_size=8, num_repeats=4,
                             frames_per_iter=50_000, seed=1,
                             length_strategy="deterministic",
                             snap_to_bucket=False)
    plans = list(A.allocate_archives(utt2len, utt2label, cfg2,
                                     num_archives=3))
    # one deterministic length per archive, increasing geometrically
    lens = [set(mb.length for mb in p.minibatches) for p in plans]
    assert all(len(s) == 1 for s in lens)
    vals = [next(iter(s)) for s in lens]
    assert vals[0] == 100 and vals[-1] == 200 and vals == sorted(vals)


def test_ranges_roundtrip():
    utt2len, utt2label = _toy_corpus(num_spk=3, utts_per_spk=3)
    (plan,) = A.allocate_archives(utt2len, utt2label, CFG, num_archives=1)
    lines = plan.to_ranges_lines()
    back = A.ArchivePlan.from_ranges_lines(0, lines,
                                           length_bucket=CFG.length_bucket)
    assert back.minibatches == plan.minibatches


def test_streaming_matches_materialized(tmp_path):
    """stream_plan_loader must yield the exact minibatch sequence the
    materialised .xta stores (same shuffle seed ⇒ bit-identical fp16)."""
    utt2len, utt2label = _toy_corpus(num_spk=4, utts_per_spk=3)
    cfg = A.AllocatorConfig(min_frames=50, max_frames=90, minibatch_size=4,
                            num_repeats=2, frames_per_iter=4_000, seed=3)
    (plan,) = A.allocate_archives(utt2len, utt2label, cfg, num_archives=1)
    feats = {u: np.random.RandomState(hash(u) % 2**31).randn(
        n, 23).astype(np.float32) for u, n in utt2len.items()}
    path = str(tmp_path / "egs.0.xta")
    AR.materialize_archive(plan, path, fetch=lambda u: feats[u],
                           shuffle_seed=42)
    stored = list(AR.ArchiveReader(path))
    streamed = list(AR.stream_plan_loader(plan, fetch=lambda u: feats[u],
                                          shuffle_seed=42, queue_size=2))
    assert len(stored) == len(streamed)
    for (xa, ya, ta), (xb, yb, tb) in zip(stored, streamed):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        assert ta == tb


def test_streaming_from_ark_source(tmp_path):
    """utt2src routing: stream minibatches straight out of a Kaldi ark
    (the egs feature ark), native decoder or Python fallback."""
    from xvector_tpu.io import kaldi_ark as kio
    utt2len = {"a": 200, "b": 180}
    utt2label = {"a": 0, "b": 1}
    cfg = A.AllocatorConfig(min_frames=64, max_frames=64, minibatch_size=2,
                            num_repeats=2, frames_per_iter=512, seed=9,
                            length_bucket=64)
    (plan,) = A.allocate_archives(utt2len, utt2label, cfg, num_archives=1)
    feats = {u: np.random.RandomState(i).randn(n, 7).astype(np.float32)
             for i, (u, n) in enumerate(utt2len.items())}
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with kio.ArkWriter(ark, scp) as w:
        for u, m in feats.items():
            w.write(u, m)
    src = {}
    for line in open(scp):
        u, loc = line.split()
        p, off = loc.rsplit(":", 1)
        src[u] = (p, int(off))
    for x, y, t in AR.iter_plan_minibatches(plan, utt2src=src):
        mb = None
        for cand in plan.minibatches:
            got = np.stack([np.pad(
                feats[c.utt][c.offset: c.offset + c.length].astype(
                    np.float16),
                ((0, cand.padded_length - c.length), (0, 0)))
                for c in cand.chunks])
            if got.shape == x.shape and np.array_equal(got, x):
                mb = cand
                break
        assert mb is not None


def test_recipe_stream_egs_training_parity(tmp_path):
    """Recipe(stream_egs=True) must train to EXACTLY the same parameters
    as the materialised path: same plans, same shuffle, same trainer."""
    import jax
    from xvector_tpu.cli.run import Recipe, RecipeConfig
    from xvector_tpu.extract.extractor import ExtractorConfig
    from xvector_tpu.io.datadir import DataDir
    from xvector_tpu.train.trainer import TrainConfig

    rng = np.random.RandomState(0)
    sr = 8000
    waves = {f"spk{s}_u{u}": (np.sin(2 * np.pi * (500 + 700 * s)
                                     * np.arange(sr * 2) / sr) * 3000
                              + 200 * rng.randn(sr * 2)).astype(np.float32)
             for s in range(3) for u in range(3)}
    data = DataDir(utt2spk={u: u.split("_")[0] for u in waves})

    def build(work, stream):
        return RecipeConfig(
            work_dir=str(work), min_utt_frames=40, min_spk_utts=2,
            num_valid_utts=2, num_archives=2, stream_egs=stream,
            allocator=A.AllocatorConfig(
                min_frames=40, max_frames=60, minibatch_size=4,
                num_repeats=2, frames_per_iter=3_000, length_bucket=32),
            train=TrainConfig(model="tiny", num_targets=1, num_epochs=1,
                              compute_dtype="float32", block_size=2),
            extractor=ExtractorConfig(min_chunk=25, max_chunk=100,
                                      batch_size=4))

    params = {}
    for stream in (False, True):
        r = Recipe(build(tmp_path / f"s{int(stream)}", stream))
        feat = r.make_features(data, lambda u: waves[u], split="all",
                               dither_seed=None)
        _, _, n = r.make_egs(feat)
        trainer = r.train(n)
        params[stream] = jax.tree.map(np.asarray, trainer.params)
    flat_a = jax.tree.leaves(params[False])
    flat_b = jax.tree.leaves(params[True])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)
    # and the streaming workdir holds ranges files, no train .xta
    s1 = tmp_path / "s1"
    assert (s1 / "egs.0.ranges").exists()
    assert not (s1 / "egs.0.xta").exists()


# ---------------------------------------------------------------------------
# Dormant reference strategies (create_egs.py:285-474), selectable here
# ---------------------------------------------------------------------------

def test_kaldi_original_strategy():
    """kaldi_original: one length per archive, ≤ num_repeats draws per
    speaker per archive, no overlap control, chunks within bounds."""
    utt2len, utt2label = _toy_corpus()
    cfg = A.AllocatorConfig(min_frames=100, max_frames=200, minibatch_size=8,
                            num_repeats=4, frames_per_iter=4_000, seed=3,
                            strategy="kaldi_original")
    plans = list(A.allocate_archives(utt2len, utt2label, cfg,
                                     num_archives=3))
    assert len(plans) == 3
    for plan in plans:
        lengths = {mb.length for mb in plan.minibatches}
        assert len(lengths) == 1                  # single archive length
        draws = collections.Counter(
            c.label for mb in plan.minibatches for c in mb.chunks)
        assert max(draws.values()) <= cfg.num_repeats
        for mb in plan.minibatches:
            for c in mb.chunks:
                assert 0 <= c.offset
                assert c.offset + c.length <= utt2len[c.utt]
                assert c.label == utt2label[c.utt]


def test_kaldi_original_deterministic_ladder():
    """With length_strategy=deterministic the archive lengths follow the
    geometric min→max ladder (create_egs.py:223-231)."""
    utt2len, utt2label = _toy_corpus()
    # snap_to_bucket off: this test asserts the reference FORMULA values
    cfg = A.AllocatorConfig(min_frames=100, max_frames=400, minibatch_size=4,
                            num_repeats=8, frames_per_iter=2_000, seed=3,
                            strategy="kaldi_original",
                            length_strategy="deterministic",
                            snap_to_bucket=False)
    n = 4
    plans = list(A.allocate_archives(utt2len, utt2label, cfg,
                                     num_archives=n))
    got = [p.minibatches[0].length for p in plans]
    want = [A.deterministic_chunk_length(i, n, 100, 400) for i in range(n)]
    assert got == want
    assert got[0] == 100 and got[-1] == 400


def test_whole_strategy_weighting_and_replacement():
    """our_splitting: utterance-rich speakers draw more (log₅ weight);
    utterances per speaker are sampled without replacement within a pool
    refill cycle."""
    # speaker 0 has 25 utts (log₅=2), speaker 1 has 1 utt (weight 1)
    utt2len, utt2label = {}, {}
    for u in range(25):
        utt2len[f"rich_u{u}"] = 600
        utt2label[f"rich_u{u}"] = 0
    utt2len["poor_u0"] = 600
    utt2label["poor_u0"] = 1
    cfg = A.AllocatorConfig(min_frames=100, max_frames=100, minibatch_size=4,
                            num_repeats=6, frames_per_iter=6_000, seed=5,
                            strategy="whole")
    (plan,) = list(A.allocate_archives(utt2len, utt2label, cfg,
                                       num_archives=1))
    draws = collections.Counter(
        c.label for mb in plan.minibatches for c in mb.chunks)
    # weight(rich)=num_repeats*1*2, weight(poor)=num_repeats*1*1
    assert draws[0] > draws[1]
    # without replacement: the first 25 rich draws are distinct utterances
    rich_utts = [c.utt for mb in plan.minibatches for c in mb.chunks
                 if c.label == 0][:25]
    assert len(set(rich_utts)) == len(rich_utts)


def test_unknown_strategy_rejected():
    utt2len, utt2label = _toy_corpus()
    cfg = A.AllocatorConfig(strategy="bogus")
    with pytest.raises(ValueError):
        list(A.allocate_archives(utt2len, utt2label, cfg, num_archives=1))


def test_snap_to_bucket_fills_padded_shapes_exactly():
    """With snapping on (the default) every planned minibatch length IS
    its padded bucket shape — no pad frames, and the trainer's dense
    fast path fires on every block; lengths stay inside [min, max]."""
    utt2len, utt2label = _toy_corpus()
    cfg = A.AllocatorConfig(min_frames=100, max_frames=400,
                            minibatch_size=8, num_repeats=4,
                            frames_per_iter=50_000, seed=5,
                            length_bucket=32)
    plans = list(A.allocate_archives(utt2len, utt2label, cfg,
                                     num_archives=2))
    lengths = set()
    for p in plans:
        for mb in p.minibatches:
            assert mb.length == mb.padded_length, (mb.length,
                                                   mb.padded_length)
            assert mb.length % 32 == 0
            assert cfg.min_frames <= mb.length <= cfg.max_frames
            lengths.add(mb.length)
    assert len(lengths) > 1          # variety preserved on the grid


def test_reference_exact_allocator_rejects_all_short_speaker():
    """A speaker whose every utterance is shorter than a drawable chunk
    length would send the reference's redraw loop (create_egs.py) into
    nontermination; our mirror raises a loud error instead of hanging."""
    utt2len = {"a0": 500, "a1": 480, "b0": 150, "b1": 160}
    utt2label = {"a0": 0, "a1": 0, "b0": 1, "b1": 1}
    cfg = A.AllocatorConfig(min_frames=200, max_frames=400,
                            minibatch_size=2, num_repeats=8,
                            frames_per_iter=4_000, seed=0,
                            reference_semantics=True)
    with pytest.raises(ValueError, match="shorter than the drawn"):
        list(A.allocate_archives(utt2len, utt2label, cfg, num_archives=2))


def test_write_reference_tar_rejects_ragged_minibatches(tmp_path):
    """Ragged minibatch sizes cannot be represented in the plain (N, B)
    labels layout — fail loudly BEFORE any tar bytes hit disk."""
    from xvector_tpu.data import reference_tar as RT
    mbs = [(np.zeros((4, 10, 3), np.float16), np.zeros(4, np.int32)),
           (np.zeros((3, 10, 3), np.float16), np.zeros(3, np.int32))]
    tar = str(tmp_path / "egs.1.tar")
    with pytest.raises(ValueError, match="uniform minibatch size"):
        RT.write_reference_tar(tar, mbs)
    assert not os.path.exists(tar)
