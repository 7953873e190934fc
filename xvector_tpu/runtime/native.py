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
    if not os.path.exists(_LIB_PATH) and not _build():
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


class ArkStream:
    """Sequential native iterator over a binary ark file: yields
    ``(key, (rows, cols) float32 matrix)`` — the C++ replacement for the
    Python ``read_mat_ark`` loop on the extraction hot path."""

    _KEY_CAP = 1024

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None or lib.xta_version() < 2:
            raise RuntimeError("libxta streaming unavailable")
        self._lib = lib
        self._h = lib.xta_stream_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open ark {path}")
        self._path = path

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
