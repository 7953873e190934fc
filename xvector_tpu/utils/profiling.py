"""Profiling & step-timing instrumentation.

The reference's observability is wall-clock bucketing of disk-wait vs
GPU-wait per minibatch (``models.py:240-289``).  Equivalents here:

* :class:`StepTimer` — host/device wait split per phase, summarised the
  way the reference logs it (the load-balance signal survives);
* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (the reference never used TF's
  profiler; on TPU this is the first tool to reach for).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

__all__ = ["StepTimer", "trace", "device_forensics"]


class StepTimer:
    """Accumulate wall-clock per named phase.

    >>> t = StepTimer()
    >>> with t("disk"): ...
    >>> with t("device"): ...
    >>> t.summary()   # {'disk': ..., 'device': ..., 'disk_pct': ...}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str) -> Iterator[None]:
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.totals[phase] += time.monotonic() - t0
            self.counts[phase] += 1

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        total = sum(self.totals.values()) or 1.0
        for phase, secs in self.totals.items():
            out[phase] = secs
            out[f"{phase}_pct"] = 100.0 * secs / total
            out[f"{phase}_mean_ms"] = 1e3 * secs / max(self.counts[phase], 1)
        return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace scope; view with TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_forensics() -> Dict:
    """Post-mortem snapshot of the accelerator runtime, the TPU-shaped
    equivalent of the reference's GPU-unavailability dump (nvidia-smi
    parse + ``qstat -xml``, ``ze_utils.py:570-623``): backend, devices,
    per-device memory stats, live-buffer census, and the distributed
    topology.  Safe to call from any failure path — every probe is
    individually guarded."""
    import jax
    out: Dict = {}
    try:
        out["backend"] = jax.default_backend()
        out["process_index"] = jax.process_index()
        out["process_count"] = jax.process_count()
        out["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:          # runtime itself may be down
        out["runtime_error"] = repr(e)
        return out
    mem = {}
    for d in jax.local_devices():
        try:
            mem[str(d)] = d.memory_stats()
        except Exception:
            mem[str(d)] = None      # backend without memory_stats
    out["memory_stats"] = mem
    try:
        bufs = jax.live_arrays()
        out["live_arrays"] = len(bufs)
        out["live_bytes"] = int(sum(
            b.size * b.dtype.itemsize for b in bufs))
    except Exception:
        pass
    return out
