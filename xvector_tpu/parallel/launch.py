"""Multi-host launch utilities.

Replaces the reference's SGE job submission fabric (``queue.pl``/``run.pl``
selected in ``cmd.sh:14-26``, invoked per iteration per job from
``train_dnn.py:270``) with the TPU-native model: ONE SPMD program started
once per host; ``jax.distributed`` wires the hosts into a single device
mesh and XLA collectives replace checkpoint exchange over NFS.

Launch contract (a TPU pod slice's standard environment):
  * on GCE TPU VMs, ``jax.distributed.initialize()`` discovers everything
    from the metadata server — call :func:`auto_initialize` with no args;
  * anywhere else, set XVEC_COORDINATOR, XVEC_NUM_PROCESSES,
    XVEC_PROCESS_ID (or pass them explicitly).

Per-host data: each host feeds only its shard of every global batch.
:func:`host_local_batch_slice` gives the per-host row range;
:func:`shard_archives` splits archive indices round-robin per host, which
replaces the reference's per-job archive assignment
(``train_dnn.py:247-252`` ``archive_index = k % num_archives``).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax

__all__ = ["auto_initialize", "host_local_batch_slice", "shard_archives",
           "is_coordinator"]


def auto_initialize(coordinator: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None):
    """Bring up jax.distributed from args or XVEC_* env; no-op for a
    single process."""
    coordinator = coordinator or os.environ.get("XVEC_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("XVEC_NUM_PROCESSES", "1"))
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("XVEC_PROCESS_ID", "0")))
    if num_processes <= 1 and coordinator is None:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[begin, end) rows of a global batch this host must provide (the
    batch axis is sharded over all devices; each host owns a contiguous
    row range)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n_proc} hosts")
    per = global_batch // n_proc
    i = jax.process_index()
    return i * per, (i + 1) * per


def shard_archives(num_archives: int) -> List[int]:
    """Archive indices this host materialises/reads (round-robin), the
    per-host fan-out replacing get_egs.sh's nj-way archive writers."""
    return list(range(jax.process_index(), num_archives,
                      jax.process_count()))
