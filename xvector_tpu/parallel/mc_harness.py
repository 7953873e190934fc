"""Multi-controller end-to-end validation harness.

Drives the reference's WHOLE L4 training contract
(``train_dnn.py:463-593``) under TWO real controller processes joined by
``jax.distributed`` (gloo) over ONE SHARED work dir — the coordination
surface where multi-host bugs actually live — instead of the single
train-step the round-2 dryrun certified:

* per-host materialisation of real ``.xta`` archives
  (:func:`launch.shard_archives`, the ``get_egs.sh:195-204`` nj fan-out);
* ``Trainer.train``'s full outer loop — schedules, iteration checkpoints
  (collective orbax save into the shared dir, coordinator-owned ``done``
  sentinels and GC), inline held-out diagnostics under 2 controllers;
* a deterministic preemption after 2 iterations (both controllers stop at
  the same safe point — a signal-timing race between controllers would
  desync the collective program order, so multi-host preemption must be
  state-derived), process exit, and a FRESH process pair resuming from
  the shared checkpoints to completion;
* utterance-sharded extraction with the final model.

Consumed by ``tests/test_multiprocess.py`` and
``__graft_entry__.dryrun_multichip``; the single-controller reference run
(:func:`run_single_controller`) provides the parity target.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from typing import Dict, List, Tuple

import numpy as np

NUM_SPK = 8
FEAT = 23
UTTS_PER_SPK = 6          # speaker 0 gets 2 extra utts: the 50-utt total
#                           makes stride extraction shards UNEVEN at any
#                           host count that does not divide 50
FRAMES = 120
NUM_ARCHIVES = 2
GLOBAL_MB = 8
NUM_EPOCHS = 2            # x num_archives archives = iteration count
STOP_AFTER = 2            # the "kill" point of the interrupted run


def build_corpus(work: str, seed: int = 0):
    """Write the shared feature ark + utt2spk: linearly separable speaker
    means so four iterations of Adam visibly learn."""
    from ..io import kaldi_ark as kio
    os.makedirs(work, exist_ok=True)
    rng = np.random.RandomState(seed)
    means = rng.randn(NUM_SPK, FEAT) * 2.0
    ark = os.path.join(work, "egs_feats.ark")
    if os.path.exists(ark + ".done"):
        return
    with kio.ArkWriter(ark, ark + ".scp") as w, \
            open(os.path.join(work, "utt2spk"), "w") as f:
        for s in range(NUM_SPK):
            for u in range(UTTS_PER_SPK + (2 if s == 0 else 0)):
                utt = f"s{s}-u{u}"
                mat = (rng.randn(FRAMES, FEAT) * 0.3
                       + means[s]).astype(np.float32)
                w.write(utt, mat)
                f.write(f"{utt} {s}\n")
    open(ark + ".done", "w").close()


def _plans(work: str, num_archives: int = NUM_ARCHIVES):
    """Archive plans, rebuilt deterministically on every process from the
    shared manifest (file order fixes dict order fixes the RNG draws)."""
    from ..data import allocator as alloclib
    from ..io import kaldi_ark as kio
    utt2int = {u: int(s) for u, s in
               (line.split() for line in
                open(os.path.join(work, "utt2spk")))}
    utt2src: Dict[str, Tuple[str, int]] = {}
    for line in open(os.path.join(work, "egs_feats.ark.scp")):
        utt, loc = line.split()
        path, off = loc.rsplit(":", 1)
        utt2src[utt] = (path, int(off))
    utt2len = {u: FRAMES for u in utt2src}
    cfg = alloclib.AllocatorConfig(
        min_frames=40, max_frames=60, minibatch_size=GLOBAL_MB,
        num_repeats=2, frames_per_iter=20000, length_bucket=8, seed=77)
    plans = list(alloclib.allocate_archives(utt2len, utt2int, cfg,
                                            num_archives=num_archives))
    return plans, utt2src


def _train_cfg(final_combine: bool = False):
    from ..train.trainer import TrainConfig
    return TrainConfig(num_targets=NUM_SPK, model="tiny",
                       compute_dtype="float32", block_size=2,
                       num_epochs=NUM_EPOCHS, final_combine=final_combine,
                       combine_opt_steps=12 if final_combine else 80)


def _extract_utts(work: str, params, state, utts: List[str],
                  utt2src) -> Dict[str, list]:
    from ..extract.extractor import ExtractorConfig, XvectorExtractor
    from ..io import kaldi_ark as kio
    ex = XvectorExtractor(_model_cfg(), params, state,
                          ExtractorConfig(min_chunk=20, max_chunk=200,
                                          batch_size=4,
                                          compute_dtype="float32"))
    stream = ((u, kio.read_mat("%s:%d" % utt2src[u])) for u in utts)
    return {u: np.asarray(xv).tolist() for u, xv in ex.extract_iter(stream)}


def _model_cfg():
    from ..models import tdnn
    from dataclasses import replace
    return replace(tdnn.MODEL_ZOO["tiny"], feat_dim=FEAT)


def worker_main(argv: List[str]):
    """Body of one controller process.  argv: port pid work phase
    n_procs local_devices num_archives — phase 1 materialises this
    host's archive shard then trains with the deterministic stop at
    STOP_AFTER iterations; phase 2 resumes from the shared checkpoints
    to completion and extracts this host's utterance shard."""
    import jax
    port, pid, work, phase = (argv[0], int(argv[1]), argv[2],
                              int(argv[3]))
    n_procs = int(argv[4]) if len(argv) > 4 else 2
    local_devices = int(argv[5]) if len(argv) > 5 else 2
    num_archives = int(argv[6]) if len(argv) > 6 else NUM_ARCHIVES
    final_combine = bool(int(argv[7])) if len(argv) > 7 else False
    empty_diag = bool(int(argv[8])) if len(argv) > 8 else False
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs * local_devices
    from jax.experimental import multihost_utils

    from ..data import archives as archlib
    from ..io import kaldi_ark as kio
    from ..train import checkpoints as C
    from ..train.trainer import Trainer
    from . import launch
    from . import mesh as meshlib

    plans, utt2src = _plans(work, num_archives)
    # per-host archive materialisation over the shared dir (idempotent —
    # phase 2 after an interruption finds them already on disk; with
    # hosts > archives some hosts materialise NOTHING and must still hit
    # the barrier)
    for i in launch.shard_archives(len(plans)):
        archlib.materialize_archive(
            plans[i], os.path.join(work, f"egs.{i}.xta"),
            lambda u: kio.read_mat("%s:%d" % utt2src[u]))
    multihost_utils.sync_global_devices("mc_harness_egs")

    mesh = meshlib.make_mesh(data=n_procs * local_devices, model=1)
    tr = Trainer(_train_cfg(final_combine), os.path.join(work, "exp"),
                 mesh=mesh, feat_dim=FEAT)
    lo, hi = launch.host_local_batch_slice(GLOBAL_MB)

    def batches(i):
        reader = archlib.ArchiveReader(os.path.join(work, f"egs.{i}.xta"))
        for x, y, t in reader:
            yield x[lo:hi], y[lo:hi], t

    def valid():
        # one diagnostics minibatch, host-sliced like training rows —
        # or NOTHING under empty_diag (the combine-fallback contract:
        # the coordinator must signal the skip through the broadcast,
        # not leave the peers deadlocked in it)
        if empty_diag:
            return
        for item in batches(0):
            yield item
            return

    stop = None
    if phase == 1:
        # the deterministic multi-host "kill": both controllers observe
        # the shared checkpoint state, so both stop at the same boundary
        def stop():
            latest = C.latest_complete(tr.work_dir)
            return latest is not None and latest >= STOP_AFTER

    final = tr.train(batches, num_archives=len(plans),
                     valid_batches=valid, preemption=stop)

    out = {"final_iterations": final}
    if phase == 2:
        w = np.asarray(jax.device_get(tr.params["embed"][0]["w"]))
        out["checksum"] = float(np.sum(np.abs(w)))
        out["w00"] = float(w[0, 0])
        final_link = os.path.join(tr.work_dir, "model_final")
        out["final_target"] = os.path.basename(os.path.realpath(final_link))
        # full final params (tiny model, a few hundred KB of json): lets
        # the contract test bound gloo-vs-single drift in PARAMS space,
        # where it originates, instead of via nonlinearly-amplified
        # embedding-space proxies
        out["params_flat"] = {
            jax.tree_util.keystr(path): np.asarray(leaf).tolist()
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                jax.device_get(tr.params))}
        # utterance-sharded extraction (extract_xvectors.sh's nj fan-out):
        # each host forwards its own utterance shard on local devices
        params = jax.device_get(tr.params)
        state = jax.device_get(tr.state)
        utts = sorted(utt2src)[pid::n_procs]
        out["num_utts_local"] = len(utts)
        out["xv"] = _extract_utts(work, params, state, utts, utt2src)
    with open(os.path.join(work, f"mc_result_p{phase}_{pid}.json"),
              "w") as f:
        json.dump(out, f)


_WORKER_TEMPLATE = """
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + os.environ.get("MC_LOCAL_DEVICES", "2"))
sys.path.insert(0, {repo!r})
from xvector_tpu.parallel import mc_harness
mc_harness.worker_main(sys.argv[1:])
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_group(work: str, phase: int, timeout: int = 420,
                 n_procs: int = 2, local_devices: int = 2,
                 num_archives: int = NUM_ARCHIVES,
                 final_combine: bool = False, empty_diag: bool = False):
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    worker = os.path.join(work, "mc_worker.py")
    if not os.path.exists(worker):
        with open(worker, "w") as f:
            f.write(_WORKER_TEMPLATE.format(repo=repo))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["MC_LOCAL_DEVICES"] = str(local_devices)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), work, str(phase),
         str(n_procs), str(local_devices), str(num_archives),
         str(int(final_combine)), str(int(empty_diag))],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(n_procs)]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0].decode())
    except subprocess.TimeoutExpired:
        # one worker died mid-collective and its peer is blocked in a
        # gloo barrier: kill BOTH (else they leak holding the port and
        # work dir) and report every worker's output, not just the
        # hung one's silence
        for p in procs:
            if p.poll() is None:
                p.kill()
        tails = [p.communicate()[0].decode()[-2000:] for p in procs]
        raise RuntimeError(
            f"mc_harness phase-{phase} timed out after {timeout}s; "
            "worker outputs:\n" + "\n--- next worker ---\n".join(tails))
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(
                f"mc_harness phase-{phase} worker failed:\n{o[-4000:]}")
    return [json.load(open(os.path.join(work,
                                        f"mc_result_p{phase}_{pid}.json")))
            for pid in range(n_procs)]


def run_group(work: str, interrupt: bool = True, n_procs: int = 2,
              local_devices: int = 2,
              num_archives: int = NUM_ARCHIVES,
              final_combine: bool = False,
              empty_diag: bool = False) -> Dict:
    """The full N-controller flow.  ``interrupt=True`` runs phase 1
    (train, deterministic stop after STOP_AFTER iterations, exit) then
    phase 2 with FRESH processes (resume from the shared orbax
    checkpoints, finish, extract); ``interrupt=False`` merges both phases
    into one uninterrupted group by running phase 2 directly."""
    build_corpus(work)
    if interrupt:
        res1 = _spawn_group(work, phase=1, n_procs=n_procs,
                            local_devices=local_devices,
                            num_archives=num_archives,
                            final_combine=final_combine)
        assert all(r["final_iterations"] == STOP_AFTER for r in res1), res1
    res2 = _spawn_group(work, phase=2, n_procs=n_procs,
                        local_devices=local_devices,
                        num_archives=num_archives,
                        final_combine=final_combine,
                        empty_diag=empty_diag)
    assert all(r["checksum"] == res2[0]["checksum"] for r in res2), res2
    xv: Dict[str, list] = {}
    for r in res2:
        xv.update(r["xv"])              # merge utterance shards
    return {"final_iterations": res2[0]["final_iterations"],
            "checksum": res2[0]["checksum"], "w00": res2[0]["w00"],
            "xv": {u: np.asarray(v, np.float32) for u, v in xv.items()},
            "shard_sizes": [r["num_utts_local"] for r in res2],
            "final_target": res2[0].get("final_target"),
            "params_flat": {k: np.asarray(v, np.float32) for k, v in
                            res2[0].get("params_flat", {}).items()},
            "interrupted": interrupt}


def run_two_process(work: str, interrupt: bool = True) -> Dict:
    """Backward-compatible two-controller wrapper around run_group."""
    return run_group(work, interrupt=interrupt, n_procs=2)


def run_single_controller(work: str, devices) -> Dict:
    """The parity target: the identical corpus/plans/loop on ONE
    controller over 4 local devices, full global minibatches."""
    import jax

    from ..data import archives as archlib
    from ..io import kaldi_ark as kio
    from ..train.trainer import Trainer
    from . import mesh as meshlib

    build_corpus(work)
    plans, utt2src = _plans(work)
    for i, plan in enumerate(plans):
        archlib.materialize_archive(
            plan, os.path.join(work, f"egs.{i}.xta"),
            lambda u: kio.read_mat("%s:%d" % utt2src[u]))
    mesh = meshlib.make_mesh(data=4, model=1, devices=devices[:4])
    tr = Trainer(_train_cfg(), os.path.join(work, "exp"), mesh=mesh,
                 feat_dim=FEAT)

    def batches(i):
        yield from archlib.ArchiveReader(os.path.join(work,
                                                      f"egs.{i}.xta"))

    def valid():
        for item in batches(0):
            yield item
            return

    final = tr.train(batches, num_archives=len(plans), valid_batches=valid)
    w = np.asarray(jax.device_get(tr.params["embed"][0]["w"]))
    xv = _extract_utts(work, jax.device_get(tr.params),
                       jax.device_get(tr.state), sorted(utt2src), utt2src)
    return {"final_iterations": final,
            "checksum": float(np.sum(np.abs(w))),
            "w00": float(w[0, 0]),
            "params_flat": {
                jax.tree_util.keystr(path): np.asarray(leaf)
                for path, leaf in jax.tree_util.tree_leaves_with_path(
                    jax.device_get(tr.params))},
            "xv": {u: np.asarray(v, np.float32) for u, v in xv.items()}}
