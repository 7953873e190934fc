"""Generate tests/golden/feature_golden.npz — frozen f64 feature-chain
fixtures derived ONLY from the independent Kaldi-formula oracle in
tests/test_features.py.

Run from the repo root: ``python tests/golden/make_feature_golden.py``.
Regenerate only after a deliberate, reviewed semantics change.

Cases (all 8 kHz, int16-scale, deterministic):
  0: speech-shaped noise bursts with silence gaps (exercises VAD on/off)
  1: short utterance (odd length 4321 — reflection framing edge)
  2: long mixed tones+noise (10 s — sliding-CMVN interior + edge windows)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from test_features import (_numpy_energy_vad, _numpy_mfcc)  # noqa: E402

from xvector_tpu.ops import features as F  # noqa: E402 (configs only)


def _waves():
    rng = np.random.RandomState(20260819)
    # case 0: bursts + silence
    w0 = np.zeros(16000)
    for a, b, scale in [(1000, 5000, 4000.0), (9000, 14000, 2500.0)]:
        w0[a:b] = rng.randn(b - a) * scale
    w0 += rng.randn(16000) * 2.0      # low noise floor so log-energy finite
    # case 1: odd-length short utterance
    n1 = 4321
    t1 = np.arange(n1) / 8000.0
    w1 = (3000 * np.sin(2 * np.pi * 430.0 * t1)
          + rng.randn(n1) * 500.0)
    # case 2: long mixed content
    n2 = 80000
    t2 = np.arange(n2) / 8000.0
    w2 = (2000 * np.sin(2 * np.pi * 300.0 * t2)
          + 1200 * np.sin(2 * np.pi * 1700.0 * t2 + 0.7)
          + rng.randn(n2) * 800.0)
    return [np.round(w).astype(np.float64) for w in (w0, w1, w2)]


def _oracle_sliding_cmvn_rows(feats, rows, window=300):
    t = len(feats)
    out = []
    for r in rows:
        w = min(window, t)
        s = min(max(r - w // 2, 0), t - w)
        out.append(feats[r] - feats[s:s + w].mean(0))
    return np.stack(out)


def main():
    cfg = F.MfccConfig(dither=0.0)
    vcfg = F.VadConfig()
    data = {}
    waves = _waves()
    data["n_cases"] = np.int64(len(waves))
    for i, wave in enumerate(waves):
        mfcc = _numpy_mfcc(wave, cfg)
        vad = _numpy_energy_vad(mfcc, vcfg)
        # assert decision margin so f32 reruns can't flip any frame
        log_e = mfcc[:, 0]
        thresh = vcfg.energy_threshold \
            + vcfg.energy_mean_scale * log_e.mean()
        margin = np.abs(log_e - thresh).min()
        assert margin > 1e-3, f"case {i}: VAD margin {margin} too small"
        t = len(mfcc)
        rows = np.unique(np.array(
            [0, 1, 2, t // 2, t - 2, t - 1, 149, 150, 151, t - 151],
            dtype=np.int64) % t)
        data[f"wave_{i}"] = wave
        data[f"mfcc_{i}"] = mfcc
        data[f"vad_{i}"] = vad
        data[f"cmvn_rows_{i}"] = rows
        data[f"cmvn_{i}"] = _oracle_sliding_cmvn_rows(mfcc, rows)
    out = os.path.join(os.path.dirname(__file__), "feature_golden.npz")
    np.savez_compressed(out, **data)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
