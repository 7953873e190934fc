"""Minimal shorten (v2) ENCODER — test oracle for xvector_tpu.io.shorten.

Written independently from the decoder, straight from the format rules
(Rice-coded bitstream over big-endian 32-bit words; DIFF0-3/QLPC/ZERO
block predictors; per-channel running block-mean offsets).  Exists only
so tests can synthesise valid shorten streams / embedded-shorten SPHERE
files without the external `shorten`/`sph2pipe` binaries.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence

import numpy as np

ULONGSIZE = 2
NSKIPSIZE = 1
LPCQSIZE = 2
LPCQUANT = 5
ENERGYSIZE = 3
BITSHIFTSIZE = 2
FNSIZE = 2
TYPESIZE = 4
CHANSIZE = 0
VERBATIM_CKSIZE_SIZE = 5
VERBATIM_BYTE_SIZE = 8
NWRAP = 3

FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3 = 0, 1, 2, 3
FN_QUIT, FN_BLOCKSIZE, FN_BITSHIFT, FN_QLPC = 4, 5, 6, 7
FN_ZERO, FN_VERBATIM = 8, 9

TYPE_S8, TYPE_U8 = 1, 2
TYPE_S16HL, TYPE_U16HL, TYPE_S16LH, TYPE_U16LH = 3, 4, 5, 6
TYPE_ULAW, TYPE_ALAW = 7, 10


class BitWriter:
    """MSB-first bit accumulator flushed as big-endian 32-bit words."""

    def __init__(self):
        self.bits: List[int] = []

    def put_bit(self, b: int):
        self.bits.append(b & 1)

    def put_uvar(self, value: int, k: int):
        assert value >= 0
        for _ in range(value >> k):
            self.put_bit(0)
        self.put_bit(1)
        for i in range(k - 1, -1, -1):
            self.put_bit((value >> i) & 1)

    def put_var(self, value: int, k: int):
        u = (value << 1) if value >= 0 else (((-value - 1) << 1) | 1)
        self.put_uvar(u, k + 1)

    def put_ulong(self, value: int):
        nbit = value.bit_length()
        self.put_uvar(nbit, ULONGSIZE)
        self.put_uvar(value, nbit)

    def tobytes(self) -> bytes:
        bits = self.bits + [0] * ((-len(self.bits)) % 32)
        out = bytearray()
        for w in range(0, len(bits), 32):
            v = 0
            for b in bits[w:w + 32]:
                v = (v << 1) | b
            out += struct.pack(">I", v)
        return bytes(out)


def _truncdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _best_rice_k(res: Sequence[int]) -> int:
    best_k, best_cost = 0, None
    for k in range(16):
        cost = sum((((abs(v) * 2 - (1 if v < 0 else 0)) >> k) + 1 + k)
                   for v in res)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def encode(samples: np.ndarray, ftype: int = TYPE_S16HL,
           blocksize: int = 256, nmean: int = 0,
           verbatim_head: Optional[bytes] = None,
           force_cmd: Optional[int] = None,
           qlpc_coeffs: Optional[Sequence[int]] = None,
           declare_maxnlpc: Optional[int] = None) -> bytes:
    """Encode (n, nchan) int samples as a shorten v2 stream.

    force_cmd pins every block to one predictor (e.g. FN_DIFF2) so tests
    can exercise each decoder path; qlpc_coeffs (quantised, /32) selects
    FN_QLPC with those coefficients.  declare_maxnlpc overrides the
    header's maxnlpc field (possibly below the actual LPC order, within
    the NWRAP history real encoders rely on) for adversarial tests.
    """
    samples = np.asarray(samples, np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nchan = samples.shape
    maxnlpc = len(qlpc_coeffs) if qlpc_coeffs else 0
    if declare_maxnlpc is not None:
        maxnlpc = declare_maxnlpc
    nwrap = max(NWRAP, maxnlpc,
                len(qlpc_coeffs) if qlpc_coeffs else 0)

    bw = BitWriter()
    for v in (ftype, nchan, blocksize, maxnlpc, nmean, 0):
        bw.put_ulong(v)
    if verbatim_head:
        bw.put_uvar(FN_VERBATIM, FNSIZE)
        bw.put_uvar(len(verbatim_head), VERBATIM_CKSIZE_SIZE)
        for byte in verbatim_head:
            bw.put_uvar(byte, VERBATIM_BYTE_SIZE)

    type_mean = 0x80 if ftype == TYPE_U8 else (
        0x8000 if ftype in (TYPE_U16HL, TYPE_U16LH) else 0)
    # history is zero-initialised; the mean window starts at the type mean
    hist = [[0] * nwrap for _ in range(nchan)]
    means = [[type_mean] * max(1, nmean) for _ in range(nchan)]
    pos = 0
    cur_bs = blocksize
    while pos < n:
        bs = min(cur_bs, n - pos)
        if bs != cur_bs:
            bw.put_uvar(FN_BLOCKSIZE, FNSIZE)
            bw.put_ulong(bs)
            cur_bs = bs
        for ch in range(nchan):
            block = samples[pos:pos + bs, ch]
            h = hist[ch]
            if nmean == 0:
                coffset = means[ch][0]
            else:
                coffset = _truncdiv(sum(means[ch]) + nmean // 2, nmean)
            if force_cmd == FN_ZERO or (force_cmd is None
                                        and not block.any()):
                bw.put_uvar(FN_ZERO, FNSIZE)
            elif qlpc_coeffs is not None:
                bw.put_uvar(FN_QLPC, FNSIZE)
                nlpc = len(qlpc_coeffs)
                ext = [v - coffset for v in h[len(h) - nlpc:]] + \
                    [int(v) - coffset for v in block]
                res = []
                for i in range(bs):
                    acc = 1 << LPCQUANT
                    for j, c in enumerate(qlpc_coeffs):
                        acc += c * ext[nlpc + i - j - 1]
                    res.append(ext[nlpc + i] - (acc >> LPCQUANT))
                k = _best_rice_k(res)
                bw.put_uvar(k, ENERGYSIZE)
                bw.put_uvar(nlpc, LPCQSIZE)
                for c in qlpc_coeffs:
                    bw.put_var(c, LPCQUANT)
                for r in res:
                    bw.put_var(r, k)
            else:
                cands = {
                    FN_DIFF0: [int(v) - coffset for v in block],
                    FN_DIFF1: np.diff(np.concatenate(
                        [[h[-1]], block])).tolist(),
                    FN_DIFF2: np.diff(np.concatenate(
                        [h[-2:], block]), 2).tolist(),
                    FN_DIFF3: np.diff(np.concatenate(
                        [h[-3:], block]), 3).tolist(),
                }
                if force_cmd is not None:
                    cmd = force_cmd
                else:
                    cmd = min(cands, key=lambda c: sum(
                        abs(v) for v in cands[c]))
                res = [int(v) for v in cands[cmd]]
                k = _best_rice_k(res)
                bw.put_uvar(cmd, FNSIZE)
                bw.put_uvar(k, ENERGYSIZE)
                for r in res:
                    bw.put_var(r, k)
            if nmean > 0:
                means[ch].pop(0)
                means[ch].append(_truncdiv(int(block.sum()) + bs // 2, bs))
            joined = h + [int(v) for v in block]
            hist[ch] = joined[len(joined) - nwrap:]
        pos += bs
    bw.put_uvar(FN_QUIT, FNSIZE)
    return b"ajkg" + bytes([2]) + bw.tobytes()


def sphere_with_shorten(samples: np.ndarray, sample_rate: int = 8000,
                        ulaw: bool = False, **enc_kw) -> bytes:
    """Wrap samples in a NIST SPHERE header + embedded-shorten payload."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nchan = samples.shape
    if ulaw:
        coding = "ulaw,embedded-shorten-v2.00"
        payload = encode(samples, ftype=TYPE_ULAW, **enc_kw)
        nbytes = 1
    else:
        coding = "pcm,embedded-shorten-v2.00"
        payload = encode(samples, ftype=TYPE_S16HL, **enc_kw)
        nbytes = 2
    head = (
        "NIST_1A\n   1024\n"
        f"sample_count -i {n}\n"
        f"channel_count -i {nchan}\n"
        f"sample_rate -i {sample_rate}\n"
        f"sample_n_bytes -i {nbytes}\n"
        "sample_byte_format -s2 10\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        "end_head\n")
    return head.encode().ljust(1024, b" ") + payload
