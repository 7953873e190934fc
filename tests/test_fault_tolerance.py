"""Failure-recovery tests: a run killed mid-training resumes from the last
complete iteration checkpoint and reaches the same final state as an
uninterrupted run (the TPU-native equivalent of the reference's per-job
retry + stage gating, SURVEY §5)."""

import numpy as np
import pytest

from xvector_tpu.parallel import mesh as meshlib
from xvector_tpu.train import checkpoints as C
from xvector_tpu.train.trainer import TrainConfig, Trainer
from xvector_tpu.utils.profiling import StepTimer

NUM_SPK = 6
FEAT = 23


def _batches(seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(NUM_SPK, FEAT) * 2
    out = []
    for _ in range(3):
        y = rng.randint(0, NUM_SPK, 8).astype(np.int32)
        x = (rng.randn(8, 48, FEAT) * 0.3
             + means[y][:, None, :]).astype(np.float16)
        out.append((x, y, 48))
    return out


def _mk(tmp_path, tag):
    cfg = TrainConfig(num_targets=NUM_SPK, model="tiny",
                      compute_dtype="float32", num_epochs=2, block_size=2)
    mesh = meshlib.make_mesh(data=2, model=1)
    return Trainer(cfg, str(tmp_path / tag), mesh=mesh, feat_dim=FEAT)


class _Boom(Exception):
    pass


def test_crash_and_resume_matches_uninterrupted(tmp_path):
    batches = _batches()

    # uninterrupted run
    tr_ref = _mk(tmp_path, "ref")
    tr_ref.train(lambda i: iter(batches), num_archives=2)
    want = np.asarray(tr_ref.params["output"]["b"])

    # crashing run: loader explodes at iteration 2
    tr_a = _mk(tmp_path, "crash")
    calls = {"n": 0}

    def flaky(i):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom("simulated data-plane failure")
        return iter(batches)

    with pytest.raises(_Boom):
        tr_a.train(flaky, num_archives=2)
    done = [it for it, p in C.iteration_dirs(str(tmp_path / "crash"))
            if C.is_complete(p)]
    assert max(done) == 2        # two iterations checkpointed before crash

    # fresh process resumes and completes; final params match the
    # uninterrupted run exactly (same seeds, same schedule positions)
    tr_b = _mk(tmp_path, "crash")
    tr_b.train(lambda i: iter(batches), num_archives=2)
    got = np.asarray(tr_b.params["output"]["b"])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_iteration_zero_failure_rolls_back_to_model_zero(tmp_path):
    """A failure DURING iteration 0 (after some updates) must retry from
    the saved initial parameters (model_0), not from half-updated params
    (VERDICT r1 #10); the retried run must match an uninterrupted one."""
    batches = _batches()

    tr_ref = _mk(tmp_path, "ref0")
    tr_ref.train(lambda i: iter(batches), num_archives=2)
    want = np.asarray(tr_ref.params["output"]["b"])

    cfg = TrainConfig(num_targets=NUM_SPK, model="tiny",
                      compute_dtype="float32", num_epochs=2, block_size=2,
                      max_iteration_retries=1, retry_backoff_s=0.0)
    mesh = meshlib.make_mesh(data=2, model=1)
    tr = Trainer(cfg, str(tmp_path / "it0"), mesh=mesh, feat_dim=FEAT)
    fail_once = {"armed": True}

    def loader(i):
        def gen():
            for j, b in enumerate(batches):
                # yield one minibatch (params get updated), then explode
                if j == 1 and fail_once.pop("armed", False):
                    raise _Boom("mid-iteration-0 failure")
                yield b
        return gen()

    tr.train(loader, num_archives=2)
    got = np.asarray(tr.params["output"]["b"])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_preemption_mid_iteration_resumes_bit_identically(tmp_path):
    """A SIGTERM mid-iteration abandons the in-flight iteration and exits
    cleanly; a rerun resumes from the last complete checkpoint and ends
    bit-identical to an uninterrupted run (SURVEY §5 checkpoint/resume,
    extended to cooperative preemption)."""
    import json
    import os
    import signal

    from xvector_tpu.train.preemption import GracefulPreemption

    batches = _batches()

    tr_ref = _mk(tmp_path, "ref")
    tr_ref.train(lambda i: iter(batches), num_archives=2)
    want = np.asarray(tr_ref.params["output"]["b"])

    tr_a = _mk(tmp_path, "pre")
    calls = {"n": 0}

    def loader(i):
        calls["n"] += 1
        if calls["n"] == 3:     # the REAL signal, mid-iteration 2
            def gen():
                yield batches[0]
                os.kill(os.getpid(), signal.SIGTERM)
                yield batches[1]          # stop_check fires before this
                yield batches[2]
            return gen()
        return iter(batches)

    with GracefulPreemption() as pre:
        done = tr_a.train(loader, num_archives=2, preemption=pre)
        assert pre.requested
    assert done == 2            # two complete iterations, third abandoned
    metrics = [json.loads(l) for l in
               open(str(tmp_path / "pre" / "metrics.jsonl"))]
    kinds = [m for m in metrics if m.get("kind") == "preempted"]
    assert kinds and kinds[-1]["where"] == "mid_iteration"
    assert not os.path.exists(str(tmp_path / "pre" / "model_final"))

    # rerun (fresh process equivalent): completes and matches exactly
    tr_b = _mk(tmp_path, "pre")
    final = tr_b.train(lambda i: iter(batches), num_archives=2)
    assert final == 4
    got = np.asarray(tr_b.params["output"]["b"])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_preemption_at_iteration_boundary(tmp_path):
    """A flag already set when an iteration would start exits before any
    work, returning the completed-iteration count."""
    from xvector_tpu.train.preemption import GracefulPreemption

    batches = _batches()
    tr = _mk(tmp_path, "bnd")
    pre = GracefulPreemption()          # not entered: no handlers needed
    seen = {"n": 0}

    def loader(i):
        seen["n"] += 1
        if seen["n"] == 2:
            def gen():
                yield from batches
                pre.trigger()       # fires after iteration 1's last batch
            return gen()
        return iter(batches)

    done = tr.train(loader, num_archives=2, preemption=pre)
    # iteration 1 completes (checkpointed); iteration 2 never starts
    assert done == 2 and seen["n"] == 2
    import json
    metrics = [json.loads(l) for l in
               open(str(tmp_path / "bnd" / "metrics.jsonl"))]
    kinds = [m for m in metrics if m.get("kind") == "preempted"]
    assert kinds and kinds[-1]["where"] == "iteration_boundary"


def test_preemption_handler_chains_and_restores(tmp_path):
    import os
    import signal

    from xvector_tpu.train.preemption import GracefulPreemption

    hits = []
    marker = lambda s, f: hits.append(s)           # noqa: E731
    prev = signal.signal(signal.SIGTERM, marker)
    try:
        with GracefulPreemption() as pre:
            os.kill(os.getpid(), signal.SIGTERM)
            assert pre.requested
            assert hits == [signal.SIGTERM]        # chained to previous
        assert signal.getsignal(signal.SIGTERM) is marker  # restored
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_retry_rng_differs_between_attempts(tmp_path):
    """Retries must not be bit-identical replays: with dropout active, the
    attempt index folds into the iteration RNG so a data-dependent
    failure path can change (VERDICT r1 #10)."""
    from xvector_tpu.models import tdnn
    tdnn.MODEL_ZOO.setdefault("tiny_dropout", tdnn.TdnnConfig(
        name="tiny_dropout", channels=(32, 32, 32, 32, 96),
        embed_dims=(64, 64), use_dropout=True))
    cfg = TrainConfig(num_targets=NUM_SPK, model="tiny_dropout",
                      compute_dtype="float32", num_epochs=1, block_size=2)
    mesh = meshlib.make_mesh(data=2, model=1)
    batches = _batches()

    tr_a = Trainer(cfg, str(tmp_path / "a"), mesh=mesh, feat_dim=FEAT)
    tr_a.train_one_iteration(0, iter(batches), lr=0.01, dropout=0.5,
                             shrink=1.0, attempt=0)
    a = np.asarray(tr_a.params["output"]["b"])

    tr_b = Trainer(cfg, str(tmp_path / "b"), mesh=mesh, feat_dim=FEAT)
    tr_b.train_one_iteration(0, iter(batches), lr=0.01, dropout=0.5,
                             shrink=1.0, attempt=1)
    b = np.asarray(tr_b.params["output"]["b"])
    assert not np.allclose(a, b), "attempt index did not change the RNG"

    # and attempt=0 stays deterministic across runs
    tr_c = Trainer(cfg, str(tmp_path / "c"), mesh=mesh, feat_dim=FEAT)
    tr_c.train_one_iteration(0, iter(batches), lr=0.01, dropout=0.5,
                             shrink=1.0, attempt=0)
    np.testing.assert_allclose(
        a, np.asarray(tr_c.params["output"]["b"]), atol=0)


def test_step_timer_summary():
    t = StepTimer()
    with t("disk"):
        pass
    with t("device"):
        pass
    s = t.summary()
    assert set(k.split("_")[0] for k in s) == {"disk", "device"}
    assert abs(s["disk_pct"] + s["device_pct"] - 100.0) < 1e-6


def test_seed_pinning_guards_resume(tmp_path):
    """Resuming a work dir with a different --random-seed must fail loudly
    (reference guard train_dnn.py:323-338)."""
    from xvector_tpu.train import checkpoints as C
    d = str(tmp_path / "exp")
    C.pin_seed(d, 2468)
    C.pin_seed(d, 2468)            # same seed: fine
    with pytest.raises(ValueError, match="random-seed"):
        C.pin_seed(d, 1234)


def test_device_forensics_snapshot():
    from xvector_tpu.utils.profiling import device_forensics
    snap = device_forensics()
    assert snap["backend"]
    assert snap["process_count"] >= 1
    assert len(snap["devices"]) >= 1
    assert "memory_stats" in snap


def test_model0_saved_even_with_nonzero_start_iter(tmp_path):
    """train(start_iter>0) on a fresh dir must still snapshot the initial
    params so a first-iteration failure can roll back (review r2)."""
    tr = _mk(tmp_path, "s1")
    tr.train(lambda i: iter(_batches()), num_archives=2, start_iter=3)
    assert C.is_complete(C.iteration_path(str(tmp_path / "s1"), 0))


def test_extract_cli_accepts_model0_only_dir(tmp_path):
    """A run that crashed during iteration 0 leaves only model_0; the
    extraction CLI must use it instead of claiming 'no checkpoint'."""
    from xvector_tpu.cli import extract_embedding
    from xvector_tpu.io import kaldi_ark as kio

    tr = _mk(tmp_path, "m0only")
    C.save_iteration(tr, 0)          # simulate crash-after-model_0
    rng = np.random.RandomState(0)
    feats_ark = str(tmp_path / "f.ark")
    with kio.ArkWriter(feats_ark, feats_ark + ".scp") as w:
        w.write("u0", rng.randn(80, FEAT).astype(np.float32))
    out_ark = str(tmp_path / "xv.ark")
    extract_embedding.main([
        f"--model-dir={tmp_path / 'm0only'}", "--model=tiny",
        f"--num-targets={NUM_SPK}",
        f"--feats-rspecifier=ark:{feats_ark}",
        f"--output-ark={out_ark}", "--compute-dtype=float32"])
    xv = dict(kio.read_vec_flt_scp(out_ark.replace(".ark", ".scp")))
    assert len(xv) == 1
