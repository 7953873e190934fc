"""Iteration checkpoints with reference-compatible lifecycle semantics.

Mirrors the reference's checkpoint protocol (``models.py:130-162`` save/load,
``train_dnn.py:344-346`` resume-by-skip, ``ze_utils.py:186-194`` GC keeping
the last two + every ``preserve_model_interval``-th, ``train_dnn.py:583``
``model_final`` symlink, ``done`` sentinel ``ze_utils.py:561-567``) on top of
orbax, which gives atomic commit and sharding-aware multi-host save/restore.

Layout: ``<work_dir>/model_<iter>/{ckpt/, done}``; ``model_final`` is a
symlink to the last iteration's directory.
"""

from __future__ import annotations

import os
import shutil
from typing import TYPE_CHECKING

import jax
import orbax.checkpoint as ocp

if TYPE_CHECKING:
    from .trainer import Trainer


def _is_coordinator() -> bool:
    return jax.process_index() == 0


def _sync(tag: str):
    """Cross-process barrier (no-op single-controller).  Multi-controller
    save/restore into a SHARED work dir needs (a) the coordinator's
    directory mutations ordered against every process's collective orbax
    call, and (b) the ``done`` sentinel visible everywhere before anyone
    proceeds past the iteration boundary."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"xvec_ckpt_{tag}")

__all__ = ["save_iteration", "restore_latest", "restore_into",
           "collect_garbage", "mark_final", "iteration_dirs",
           "is_complete", "pin_seed", "load_pytrees", "save_named",
           "iteration_path", "latest_complete"]


def pin_seed(work_dir: str, seed: int):
    """Seed-pinning guard (``train_dnn.py:323-338``): the first run writes
    ``srand`` into the work dir; a resume with a different ``random_seed``
    would silently diverge the allocation/shuffle/dropout streams, so it
    raises instead."""
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(work_dir), "srand")
    if os.path.exists(path):
        with open(path) as f:
            stored = int(f.read().strip())
        if stored != seed:
            raise ValueError(
                f"work dir {work_dir} was trained with --random-seed "
                f"{stored}; resuming with {seed} would diverge the "
                f"data/dropout streams (reference guard "
                f"train_dnn.py:323-338)")
        return
    # atomic: a crash mid-write must not leave a partial file that blocks
    # every future resume
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(f"{seed}\n")
    os.replace(tmp, path)


def _iter_dir(work_dir: str, it: int) -> str:
    return os.path.join(os.path.abspath(work_dir), f"model_{it}")


def iteration_path(work_dir: str, it: int) -> str:
    """Public path accessor for iteration ``it``'s checkpoint dir."""
    return _iter_dir(work_dir, it)


def latest_complete(work_dir: str):
    """Index of the newest COMPLETE iteration checkpoint, or None when
    the work dir holds none.  Disambiguates ``restore_latest``'s return
    of 0, which since the model_0 safety save can mean either 'restored
    the initial parameters' or 'found nothing'."""
    best = None
    for it, path in iteration_dirs(work_dir):
        if is_complete(path):
            best = it if best is None else max(best, it)
    return best


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "done"))


def save_iteration(trainer: "Trainer", it: int):
    """Collective under multi-controller: every process calls this at the
    same loop point with the same SHARED work dir; orbax writes each
    process's array shards, the coordinator owns directory mutations and
    the ``done`` sentinel."""
    d = _iter_dir(trainer.work_dir, it)
    ckpt = os.path.join(d, "ckpt")
    if _is_coordinator() and os.path.exists(ckpt):
        shutil.rmtree(ckpt)
    _sync(f"pre_save_{it}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt, {"params": trainer.params,
                          "state": trainer.state,
                          "opt_state": trainer.opt_state})
    _sync(f"post_save_{it}")
    if _is_coordinator():
        with open(os.path.join(d, "done"), "w") as f:
            f.write("done\n")
    _sync(f"post_done_{it}")


def restore_into(trainer: "Trainer", path: str):
    """Restore a checkpoint dir into the trainer's live pytrees (which act
    as the sharded abstract targets)."""
    ckpt = os.path.join(path, "ckpt")
    with ocp.StandardCheckpointer() as ckptr:
        target = {"params": trainer.params, "state": trainer.state,
                  "opt_state": trainer.opt_state}
        restored = ckptr.restore(ckpt, target)
    trainer.params = restored["params"]
    trainer.state = restored["state"]
    trainer.opt_state = restored["opt_state"]


def load_pytrees(trainer: "Trainer", path: str):
    """Read a checkpoint's (params, state) WITHOUT mutating the trainer —
    used by final combination to gather candidate models.

    Partial restore: the Adam state is ~2/3 of every checkpoint's bytes
    and the combination never reads it — skipping it keeps the
    20-candidate gather from moving ~1 GB over slow host↔device links."""
    ckpt = os.path.join(path, "ckpt")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            ckpt, args=ocp.args.PyTreeRestore(
                item={"params": trainer.params, "state": trainer.state},
                partial_restore=True))
    return restored["params"], restored["state"]


def save_named(trainer: "Trainer", name: str):
    """Save the trainer's live pytrees under ``<work_dir>/<name>`` with the
    same layout as iteration checkpoints (restorable by restore_into).
    Collective under multi-controller, with the same coordinator-owned
    directory mutations and barriers as :func:`save_iteration`."""
    d = os.path.join(os.path.abspath(trainer.work_dir), name)
    ckpt = os.path.join(d, "ckpt")
    if _is_coordinator() and os.path.exists(ckpt):
        shutil.rmtree(ckpt)
    _sync(f"pre_save_{name}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt, {"params": trainer.params,
                          "state": trainer.state,
                          "opt_state": trainer.opt_state})
    _sync(f"post_save_{name}")
    if _is_coordinator():
        with open(os.path.join(d, "done"), "w") as f:
            f.write("done\n")
    _sync(f"post_done_{name}")
    return d


def iteration_dirs(work_dir: str):
    out = []
    if not os.path.isdir(work_dir):
        return out
    for name in os.listdir(work_dir):
        if name.startswith("model_") and name[6:].isdigit():
            out.append((int(name[6:]), os.path.join(work_dir, name)))
    return sorted(out)


def restore_latest(trainer: "Trainer", start_iter: int = 0) -> int:
    """Resume from the newest complete iteration checkpoint ≥ start_iter.
    Returns the iteration index to continue from."""
    best = None
    for it, path in iteration_dirs(trainer.work_dir):
        if it >= start_iter and is_complete(path):
            best = (it, path)
    if best is None:
        return start_iter
    restore_into(trainer, best[1])
    return best[0]


def collect_garbage(work_dir: str, current_iter: int,
                    preserve_interval: int, keep=()):
    """Keep the last two iterations + every preserve_interval-th
    (ze_utils.py:186-194) + explicit ``keep`` iterations (the combination
    candidate set, train_dnn.py:565-567)."""
    if not _is_coordinator():     # shared work dir: one deleter
        return
    keep = set(keep)
    for it, path in iteration_dirs(work_dir):
        if it >= current_iter - 1 or it in keep:
            continue
        if preserve_interval > 0 and it % preserve_interval == 0:
            continue
        shutil.rmtree(path, ignore_errors=True)


def mark_final(work_dir: str, final_iter):
    """Point ``model_final`` at iteration ``final_iter`` (int) or at a
    named checkpoint dir (str, e.g. ``model_combined``)."""
    link = os.path.join(work_dir, "model_final")
    target = (f"model_{final_iter}" if isinstance(final_iter, int)
              else final_iter)
    if _is_coordinator():
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(target, link)
    _sync("mark_final")
