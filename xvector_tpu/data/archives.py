"""Training-archive materialisation and async loading.

Replaces the reference's npy-in-tar archives + thread loaders
(``create_tar_files.py:84-134``, ``examples_io.py:159-255``) with a
flat-binary **XTA** container designed for the TPU input path:

* minibatch tensors are stored contiguously as float16 (same on-disk dtype
  as the reference, ``examples_io.py:165``), already padded to their bucketed
  length, so a loader can hand them to ``jax.device_put`` without reshaping;
* a JSON footer indexes every minibatch (byte offset, shape, true length),
  making the format mmap/seek-friendly for a native (C++) loader;
* writes are atomic (tmp + rename) and idempotent like the reference's
  materialiser (``create_tar_files.py:123-129``).

Loading mirrors the reference's bounded-queue prefetch thread
(``examples_io.py:181-255``, queue size 16) so host disk I/O overlaps device
compute, and keeps the disk-wait/device-wait accounting split the reference
logs per minibatch (``models.py:240-289``).
"""

from __future__ import annotations

import json
import os
import queue
import struct
import threading
from typing import Callable, Dict, Iterator, List, Sequence, Tuple

import numpy as np

from .allocator import ArchivePlan

__all__ = ["write_archive", "ArchiveReader", "PrefetchLoader",
           "materialize_archive", "iter_plan_minibatches",
           "stream_plan_loader"]

_MAGIC = b"XTA1"


def write_archive(path: str, minibatches: Sequence[Tuple[np.ndarray,
                                                         np.ndarray, int]]):
    """Write [(features (B, Tpad, F) float16, labels (B,) int32,
    true_length)] to an XTA file atomically."""
    tmp = path + ".tmp"
    index: List[Dict] = []
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<q", 0))   # footer offset placeholder
        for feats, labels, true_len in minibatches:
            feats = np.ascontiguousarray(feats, dtype=np.float16)
            labels = np.ascontiguousarray(labels, dtype=np.int32)
            entry = {"offset": f.tell(), "shape": list(feats.shape),
                     "true_length": int(true_len)}
            f.write(feats.tobytes())
            entry["labels_offset"] = f.tell()
            f.write(labels.tobytes())
            index.append(entry)
        footer_at = f.tell()
        f.write(json.dumps({"minibatches": index}).encode())
        f.seek(4)
        f.write(struct.pack("<q", footer_at))
    os.replace(tmp, path)


class ArchiveReader:
    """Random-access reader over an XTA archive."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        magic = self._f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: bad magic {magic!r}")
        (footer_at,) = struct.unpack("<q", self._f.read(8))
        self._f.seek(footer_at)
        self.index = json.loads(self._f.read())["minibatches"]

    def __len__(self) -> int:
        return len(self.index)

    def read(self, i: int) -> Tuple[np.ndarray, np.ndarray, int]:
        e = self.index[i]
        shape = tuple(e["shape"])
        nbytes = int(np.prod(shape)) * 2
        self._f.seek(e["offset"])
        feats = np.frombuffer(self._f.read(nbytes),
                              dtype=np.float16).reshape(shape)
        self._f.seek(e["labels_offset"])
        labels = np.frombuffer(self._f.read(shape[0] * 4), dtype=np.int32)
        return feats, labels, e["true_length"]

    def __iter__(self):
        for i in range(len(self)):
            yield self.read(i)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _assemble_minibatch(mb, rows: Callable[[str], np.ndarray]
                        ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(B, Tpad, F) float16 + labels + true length for one minibatch plan."""
    feat_dim = rows(mb.chunks[0].utt).shape[1]
    x = np.zeros((len(mb.chunks), mb.padded_length, feat_dim),
                 dtype=np.float16)
    y = np.empty(len(mb.chunks), dtype=np.int32)
    for i, c in enumerate(mb.chunks):
        x[i, : c.length] = rows(c.utt)[c.offset: c.offset + c.length]
        y[i] = c.label
    return x, y, mb.length


def materialize_archive(plan: ArchivePlan, path: str,
                        fetch: Callable[[str], np.ndarray],
                        shuffle_seed: int | None = None):
    """Materialise one archive plan: read each chunk's feature rows via
    ``fetch(utt) -> (T, F)``, pad to the minibatch's bucketed length, store
    float16.  ``shuffle_seed`` shuffles minibatch order on disk (the
    reference shuffles at load time, train_dnn_one_iteration.py:184-188).
    Skips work if ``path`` already exists (idempotent restart)."""
    if os.path.exists(path):
        return
    cache: Dict[str, np.ndarray] = {}

    def rows(utt):
        if utt not in cache:
            # bound the cache: archives visit many utterances once
            if len(cache) > 512:
                cache.clear()
            cache[utt] = np.asarray(fetch(utt), dtype=np.float32)
        return cache[utt]

    out = [_assemble_minibatch(mb, rows) for mb in plan.minibatches]
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        order = rng.permutation(len(out))
        out = [out[i] for i in order]
    write_archive(path, out)


def iter_plan_minibatches(plan: ArchivePlan,
                          fetch: Callable[[str], np.ndarray] | None = None,
                          utt2src: Dict[str, Tuple[str, int]] | None = None,
                          shuffle_seed: int | None = None
                          ) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
    """Assemble minibatches straight from a plan — **no .xta on disk**.

    The reference's scp-direct loader path (``examples_io.DataLoader``,
    ``examples_io.py:181-221``, selected over the tar loader at
    ``train_dnn_one_iteration.py:196-203``): chunks are sliced from the
    processed-feature source at iteration time.  ``utt2src`` (utt →
    (ark_path, byte_offset)) routes decoding through libxta when built;
    otherwise ``fetch(utt) -> (T, F)`` is used.  ``shuffle_seed`` matches
    :func:`materialize_archive`'s on-disk order exactly, so streaming and
    materialised training see identical minibatch sequences."""
    from ..runtime import native
    use_native = utt2src is not None and native.available()
    if not use_native and fetch is None:
        if utt2src is None:
            raise ValueError("need fetch or utt2src")
        from ..io import kaldi_ark as kio
        fetch = lambda u: kio.read_mat(f"{utt2src[u][0]}:{utt2src[u][1]}")

    order = range(len(plan.minibatches))
    if shuffle_seed is not None:
        order = np.random.RandomState(shuffle_seed).permutation(
            len(plan.minibatches))

    cache: Dict[str, np.ndarray] = {}

    def rows(utt):
        if utt not in cache:
            if len(cache) > 512:
                cache.clear()
            cache[utt] = np.asarray(fetch(utt), dtype=np.float32)
        return cache[utt]

    feat_dim = None
    if use_native and plan.minibatches:
        feat_dim = native.mat_shape(
            *utt2src[plan.minibatches[0].chunks[0].utt])[1]
    for i in order:
        mb = plan.minibatches[i]
        if use_native:
            sources = [(utt2src[c.utt][0], utt2src[c.utt][1], c.offset,
                        c.length) for c in mb.chunks]
            feats = native.materialize_chunks(sources, mb.padded_length,
                                              feat_dim)
            labels = np.fromiter((c.label for c in mb.chunks), np.int32,
                                 len(mb.chunks))
            yield feats, labels, mb.length
        else:
            yield _assemble_minibatch(mb, rows)


def stream_plan_loader(plan: ArchivePlan,
                       fetch: Callable[[str], np.ndarray] | None = None,
                       utt2src: Dict[str, Tuple[str, int]] | None = None,
                       shuffle_seed: int | None = None,
                       queue_size: int = 16) -> "PrefetchLoader":
    """Prefetching wrapper over :func:`iter_plan_minibatches` — the drop-in
    materialisation-free replacement for ``PrefetchLoader(ArchiveReader)``."""
    return PrefetchLoader(iter_plan_minibatches(
        plan, fetch=fetch, utt2src=utt2src, shuffle_seed=shuffle_seed),
        queue_size=queue_size)


def materialize_archive_native(plan: ArchivePlan, path: str,
                               utt2src: Dict[str, Tuple[str, int]],
                               shuffle_seed: int | None = None) -> bool:
    """Materialise via libxta (OpenMP ark-decode + fp16 gather in C++).

    ``utt2src``: utt → (ark_path, byte_offset) of its *processed* feature
    matrix (the reference reads prepare_feats_for_egs.sh output the same
    way).  Returns False if the native library is unavailable — callers
    fall back to :func:`materialize_archive`.
    """
    from ..runtime import native
    if not native.available():
        return False
    if os.path.exists(path):
        return True
    feat_dim = None
    out = []
    for mb in plan.minibatches:
        sources = []
        labels = np.empty(len(mb.chunks), np.int32)
        for i, c in enumerate(mb.chunks):
            ark, off = utt2src[c.utt]
            sources.append((ark, off, c.offset, c.length))
            labels[i] = c.label
        if feat_dim is None:
            feat_dim = native.mat_shape(*utt2src[mb.chunks[0].utt])[1]
        feats = native.materialize_chunks(sources, mb.padded_length,
                                          feat_dim)
        out.append((feats, labels, mb.length))
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        out = [out[i] for i in rng.permutation(len(out))]
    write_archive(path, out)
    return True


class PrefetchLoader:
    """Background-thread minibatch prefetcher with wait-time accounting.

    Yields (feats **float16** (B, Tpad, F), labels (B,), true_len int) —
    the bytes exactly as stored, so the host→device upload is half the f32
    size and the frame mask is materialised on device from ``true_len``
    (host→device bandwidth, not compute, is the binding constraint on
    tunnel-attached chips).  ``disk_wait`` keeps the reference's
    load-balance signal (models.py:276-282).
    """

    def __init__(self, reader: ArchiveReader, queue_size: int = 16):
        self._reader = reader
        self._q: queue.Queue = queue.Queue(maxsize=queue_size)
        self._err: list = []
        self.disk_wait = 0.0
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for feats, labels, true_len in self._reader:
                self._q.put((feats, labels, true_len))
        except Exception as e:  # surface loader errors to the consumer
            self._err.append(e)
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        import time
        while True:
            t0 = time.monotonic()
            item = self._q.get()
            self.disk_wait += time.monotonic() - t0
            if item is None:
                if self._err:
                    raise self._err[0]
                return
            yield item
