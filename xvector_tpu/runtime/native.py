"""ctypes bindings for libxta (native data-plane kernels).

Builds the shared library on first use (g++ + make are in the image; no
pybind11 — plain C ABI + ctypes per the toolchain constraints).  Every
entry point has a pure-Python fallback in the main package, so the
framework runs without a compiler; the native path accelerates archive
materialisation (Kaldi ark decode + fp16 chunk gather, OpenMP-parallel).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libxta.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libxta; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # ALWAYS run make: it is a freshness no-op when the .so is newer than
    # xta_io.cc, and it rebuilds a stale .so after source fixes (which
    # would otherwise stay live forever since xta_version may not bump)
    built = _build()
    if not os.path.exists(_LIB_PATH) and not built:
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.xta_mat_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.xta_mat_shape.restype = ctypes.c_int
    lib.xta_read_mat.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.xta_read_mat.restype = ctypes.c_int
    lib.xta_materialize.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int64]
    lib.xta_materialize.restype = ctypes.c_int
    lib.xta_version.restype = ctypes.c_int
    if lib.xta_version() >= 3:
        lib.xta_stream_open_fd.argtypes = [ctypes.c_int]
        lib.xta_stream_open_fd.restype = ctypes.c_void_p
        lib.xta_stream_read_vecs.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.xta_stream_read_vecs.restype = ctypes.c_int64
        lib.xta_shorten_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.xta_shorten_probe.restype = ctypes.c_int
        lib.xta_shorten_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.xta_shorten_decode.restype = ctypes.c_int64
    if lib.xta_version() >= 2:
        lib.xta_stream_open.argtypes = [ctypes.c_char_p]
        lib.xta_stream_open.restype = ctypes.c_void_p
        lib.xta_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.xta_stream_next.restype = ctypes.c_int
        lib.xta_stream_data.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.xta_stream_data.restype = ctypes.c_int
        lib.xta_stream_close.argtypes = [ctypes.c_void_p]
        lib.xta_stream_close.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def mat_shape(path: str, offset: int = 0) -> Tuple[int, int]:
    """(rows, cols) of a Kaldi matrix at a byte offset — header-only probe,
    no payload decode."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libxta unavailable")
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    if lib.xta_mat_shape(path.encode(), offset, ctypes.byref(rows),
                         ctypes.byref(cols)):
        raise IOError(f"xta_mat_shape failed for {path}:{offset}")
    return rows.value, cols.value


def read_mat(path: str, offset: int = 0) -> np.ndarray:
    """Native Kaldi matrix read (FM/DM/CM) at a byte offset."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libxta unavailable")
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    if lib.xta_mat_shape(path.encode(), offset, ctypes.byref(rows),
                         ctypes.byref(cols)):
        raise IOError(f"xta_mat_shape failed for {path}:{offset}")
    out = np.empty((rows.value, cols.value), np.float32)
    rc = lib.xta_read_mat(
        path.encode(), offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        ctypes.byref(rows), ctypes.byref(cols))
    if rc:
        raise IOError(f"xta_read_mat failed ({rc}) for {path}:{offset}")
    return out


def stream_supported() -> bool:
    lib = get_lib()
    return lib is not None and lib.xta_version() >= 2


def shorten_supported() -> bool:
    lib = get_lib()
    return lib is not None and lib.xta_version() >= 3


def shorten_decode(payload: bytes, sample_count: Optional[int] = None
                   ) -> np.ndarray:
    """Native shorten decode → (n, nchan) int32 (raw file-type values).

    sample_count (per channel) bounds the output; embedded-shorten
    SPHERE always states it in its own header.  Pass None to decode the
    whole stream (capacity then estimated from the payload size)."""
    lib = get_lib()
    if lib is None or lib.xta_version() < 3:
        raise RuntimeError("libxta shorten unavailable")
    nchan = ctypes.c_int32()
    ftype = ctypes.c_int32()
    rc = lib.xta_shorten_probe(payload, len(payload),
                               ctypes.byref(nchan), ctypes.byref(ftype))
    if rc:
        raise ValueError(f"shorten probe failed ({rc})")
    if sample_count is None:
        # initial guess: >= 1 bit per sample; FN_ZERO blocks can beat
        # that arbitrarily, so grow and redecode until the stream ends
        # before the buffer does (rows < cap <=> hit QUIT/EOF)
        cap = max(1024, 8 * len(payload) // nchan.value + 512)
    else:
        cap = sample_count
    while True:
        out = np.empty((cap, nchan.value), np.int32)
        rows = lib.xta_shorten_decode(
            payload, len(payload),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if rows < 0:
            raise ValueError(f"shorten decode failed ({rows})")
        if sample_count is not None:
            return out[:min(rows, sample_count)]
        if rows < cap:
            return out[:rows]
        if cap >= (1 << 31):
            raise ValueError("shorten stream exceeds 2^31 samples")
        cap *= 4


class ArkStream:
    """Sequential native iterator over a binary ark file OR an open file
    descriptor (pass an int — e.g. a pipe's read end): yields ``(key,
    (rows, cols) float32 matrix)`` — the C++ replacement for the Python
    ``read_mat_ark`` loop on the extraction hot path.  FV/DV vector
    entries come back as 1×dim matrices."""

    _KEY_CAP = 1024

    def __init__(self, path_or_fd):
        lib = get_lib()
        if lib is None or lib.xta_version() < 2:
            raise RuntimeError("libxta streaming unavailable")
        self._lib = lib
        if isinstance(path_or_fd, int):
            if lib.xta_version() < 3:
                raise RuntimeError("libxta fd streaming needs version >= 3")
            self._h = lib.xta_stream_open_fd(path_or_fd)
        else:
            self._h = lib.xta_stream_open(path_or_fd.encode())
        if not self._h:
            raise IOError(f"cannot open ark {path_or_fd}")
        self._path = str(path_or_fd)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[str, np.ndarray]:
        if self._h is None:
            raise StopIteration
        key = ctypes.create_string_buffer(self._KEY_CAP)
        rows = ctypes.c_int32()
        cols = ctypes.c_int32()
        rc = self._lib.xta_stream_next(self._h, key, self._KEY_CAP,
                                       ctypes.byref(rows), ctypes.byref(cols))
        if rc == 1:
            self.close()
            raise StopIteration
        if rc:
            self.close()
            raise IOError(f"malformed ark entry in {self._path} ({rc})")
        out = np.empty((rows.value, cols.value), np.float32)
        rc = self._lib.xta_stream_data(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size)
        if rc:
            self.close()
            raise IOError(f"ark payload read failed in {self._path} ({rc})")
        return key.value.decode("latin1"), out

    def close(self):
        if self._h is not None:
            self._lib.xta_stream_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_vec_matrix(path_or_fd, dim_hint: int = 512,
                    batch_rows: int = 65536):
    """Bulk-read an ark of same-dim float vectors natively: returns
    ``(keys, (N, dim) float32)`` with ONE ctypes crossing per
    ``batch_rows`` entries (reading 100k PLDA x-vectors one entry at a
    time is Python-overhead-bound)."""
    lib = get_lib()
    if lib is None or lib.xta_version() < 3:
        raise RuntimeError("libxta bulk vector read unavailable")
    stream = ArkStream(path_or_fd)
    key_stride = 1024        # matches the C key capacity
    keys = []
    chunks = []
    dim = None
    try:
        while True:
            # first call reads ONE row with a generous float budget to
            # learn the true dim; later calls size buffers exactly
            cap = batch_rows if dim else 1
            buf = np.empty(cap * dim if dim else max(dim_hint, 1 << 20),
                           np.float32)
            # np.empty, not create_string_buffer: no 16 MB memset per batch
            kbuf = np.empty(cap * key_stride, np.uint8)
            dim_out = ctypes.c_int32()
            kused = ctypes.c_int64()
            n = lib.xta_stream_read_vecs(
                stream._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                buf.size, kbuf.ctypes.data_as(ctypes.c_char_p),
                cap * key_stride, cap,
                ctypes.byref(dim_out), ctypes.byref(kused))
            if n == -13:
                raise IOError(
                    "vector dim exceeds the probe budget "
                    f"({max(dim_hint, 1 << 20)} floats); pass a larger "
                    "dim_hint")
            if n < 0:
                raise IOError(f"bulk vector read failed ({n})")
            if n == 0:
                break
            if dim is None:
                dim = dim_out.value
            elif dim_out.value != dim:
                raise IOError("ragged vector dims in ark")
            chunks.append(buf[: n * dim].reshape(n, dim).copy())
            # split ONLY on the \n separators the C side wrote —
            # splitlines() would also split on \x1c-\x1e / \x85 bytes
            # that are legal inside Kaldi keys
            blob = kbuf[: kused.value].tobytes().decode("latin1")
            keys.extend(blob.split("\n")[:-1])
            if n < cap:
                break
    finally:
        stream.close()
    if not chunks:
        return [], np.empty((0, dim_hint), np.float32)
    return keys, (chunks[0] if len(chunks) == 1
                  else np.concatenate(chunks, axis=0))


def materialize_chunks(sources: Sequence[Tuple[str, int, int, int]],
                       pad_len: int, feat_dim: int,
                       n_slots: Optional[int] = None) -> np.ndarray:
    """Gather chunks into an fp16 tensor via the native kernel.

    sources: per-chunk (ark_path, byte_offset, row_begin, length); chunk i
    lands in slot i (or pass explicit slots via n_slots layout upstream).
    Returns (len(sources), pad_len, feat_dim) float16.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libxta unavailable")
    n = len(sources)
    n_slots = n_slots or n
    if n_slots < n:
        raise ValueError(
            f"n_slots={n_slots} < {n} chunks would write past the "
            "output buffer")
    paths = (ctypes.c_char_p * n)(*[s[0].encode() for s in sources])
    offsets = np.asarray([s[1] for s in sources], np.int64)
    row_begin = np.asarray([s[2] for s in sources], np.int32)
    lengths = np.asarray([s[3] for s in sources], np.int32)
    out_index = np.arange(n, dtype=np.int32)
    out = np.zeros((n_slots, pad_len, feat_dim), np.float16)
    rc = lib.xta_materialize(
        n, paths,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        row_begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        pad_len, feat_dim)
    if rc:
        raise IOError(f"xta_materialize failed with status {rc}")
    return out
