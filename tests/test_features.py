"""Feature front-end tests: MFCC vs an independent numpy oracle, VAD and
sliding-CMVN property/edge-case checks."""

import math

import numpy as np
import pytest

from xvector_tpu.ops import features as F


# ---------------------------------------------------------------------------
# Independent numpy oracle for Kaldi-semantics MFCC (written separately from
# the JAX implementation, used to cross-check it).
# ---------------------------------------------------------------------------

def _numpy_mfcc(wave, cfg: F.MfccConfig):
    assert cfg.dither == 0.0
    n, shift, win = len(wave), cfg.frame_shift, cfg.frame_length
    eps = np.finfo(np.float32).eps
    if cfg.snip_edges:
        t = 1 + (n - win) // shift if n >= win else 0
        starts = np.arange(t) * shift
    else:
        t = (n + shift // 2) // shift
        starts = np.arange(t) * shift + shift // 2 - win // 2
    feats = []
    window = F._window_fn(cfg).astype(np.float64)
    banks = F._mel_banks(cfg).astype(np.float64)
    dct = F._dct_matrix(cfg.num_ceps, cfg.num_mel_bins).astype(np.float64)
    lift = F._lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)
    for s in starts:
        idx = np.arange(s, s + win)
        idx = np.where(idx < 0, -idx - 1, idx)
        idx = np.where(idx >= n, 2 * n - idx - 1, idx)
        frame = wave[idx].astype(np.float64)
        if cfg.remove_dc_offset:
            frame = frame - frame.mean()
        log_e = math.log(max(np.dot(frame, frame), eps))
        if cfg.preemph:
            pre = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - cfg.preemph * pre
        frame = frame * window
        spec = np.fft.rfft(frame, cfg.fft_size)
        power = np.abs(spec[: cfg.fft_size // 2]) ** 2
        logmel = np.log(np.maximum(banks @ power, eps))
        c = dct @ logmel
        c = c * lift
        if cfg.use_energy:
            c[0] = log_e
        feats.append(c)
    return np.array(feats, dtype=np.float32)


@pytest.mark.parametrize("nsamp", [1600, 8000, 12345])
def test_mfcc_matches_numpy_oracle(nsamp):
    cfg = F.MfccConfig(dither=0.0)
    rng = np.random.RandomState(42)
    wave = (rng.randn(nsamp) * 1000).astype(np.float32)
    got = np.asarray(F.mfcc(wave, cfg))
    want = _numpy_mfcc(wave, cfg)
    assert got.shape == want.shape == (F.num_frames(nsamp, cfg), 23)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_mfcc_snip_edges_frame_count():
    cfg = F.MfccConfig(dither=0.0, snip_edges=True)
    assert F.num_frames(8000, cfg) == 1 + (8000 - 200) // 80
    cfg2 = F.MfccConfig(dither=0.0, snip_edges=False)
    assert F.num_frames(8000, cfg2) == (8000 + 40) // 80


def test_mfcc_pure_tone_hits_expected_mel_bin():
    """A 1 kHz tone must put its energy in the mel bin containing 1 kHz."""
    cfg = F.MfccConfig(dither=0.0, use_energy=False, cepstral_lifter=0.0)
    t = np.arange(8000) / cfg.sample_rate
    wave = (10000 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    banks = F._mel_banks(cfg)
    # recover log-mel by inverting the (orthogonal-rows) DCT
    feats = np.asarray(F.mfcc(wave, cfg))
    dct = F._dct_matrix(cfg.num_ceps, cfg.num_mel_bins)
    logmel = feats @ np.linalg.pinv(dct).T
    freq_bin = int(1000 / (cfg.sample_rate / cfg.fft_size))
    expect_bin = int(np.argmax(banks[:, freq_bin]))
    assert abs(int(np.argmax(logmel.mean(0))) - expect_bin) <= 1


def test_energy_vad_separates_silence():
    cfg = F.MfccConfig(dither=0.0)
    rng = np.random.RandomState(0)
    loud = (rng.randn(8000) * 5000).astype(np.float32)
    quiet = (rng.randn(8000) * 1.0).astype(np.float32)
    wave = np.concatenate([loud, quiet])
    feats = F.mfcc(wave, cfg)
    vad = np.asarray(F.energy_vad(feats))
    t = len(vad)
    assert vad[: t // 2 - 5].mean() > 0.9      # loud half voiced
    assert vad[t // 2 + 5:].mean() < 0.1       # quiet half unvoiced


def test_vad_context_smoothing():
    """An isolated high-energy frame inside silence is not voiced when the
    ±2-frame window proportion test fails."""
    feats = np.zeros((20, 23), dtype=np.float32)
    feats[:, 0] = -10.0
    feats[10, 0] = 100.0
    vad = np.asarray(F.energy_vad(feats, F.VadConfig(
        proportion_threshold=0.5, frames_context=2)))
    assert vad[10] == 0.0  # 1 of 5 frames above threshold < 50 %


def test_sliding_cmvn_matches_bruteforce():
    rng = np.random.RandomState(3)
    x = rng.randn(500, 23).astype(np.float32)
    got = np.asarray(F.sliding_cmvn(x, window=300, center=True))
    want = np.empty_like(x)
    for t in range(500):
        s = min(max(t - 150, 0), 500 - 300)
        e = s + 300
        want[t] = x[t] - x[s:e].mean(0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sliding_cmvn_short_utterance():
    """T < window: every frame normalized by the global mean."""
    rng = np.random.RandomState(4)
    x = rng.randn(50, 23).astype(np.float32)
    got = np.asarray(F.sliding_cmvn(x, window=300))
    np.testing.assert_allclose(got, x - x.mean(0, keepdims=True), atol=1e-5)


def test_select_voiced_frames():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    vad = np.array([1.0, 0.0, 1.0, 0.0])
    out = F.select_voiced_frames(x, vad)
    np.testing.assert_array_equal(out, x[[0, 2]])


# ---------------------------------------------------------------------------
# Batched masked front-end: each batched op must reproduce the per-utterance
# host path row by row on ragged lengths (wave_to_xvector building blocks).
# ---------------------------------------------------------------------------

def _ragged_waves(lens, seed=0, scale=2000.0):
    rng = np.random.RandomState(seed)
    s = max(lens)
    waves = np.zeros((len(lens), s), np.float32)
    for i, n in enumerate(lens):
        waves[i, :n] = (rng.randn(n) * scale).astype(np.float32)
    return waves, np.asarray(lens, np.int32)


def test_mfcc_batch_matches_single():
    cfg = F.MfccConfig(dither=0.0)
    lens = [8000, 5000, 12000, 123]
    waves, n = _ragged_waves(lens)
    feats, mask = F.mfcc_batch(waves, n, cfg)
    feats, mask = np.asarray(feats), np.asarray(mask)
    for i, ln in enumerate(lens):
        ref = np.asarray(F.mfcc(waves[i, :ln], cfg))
        t = ref.shape[0]
        assert mask[i].sum() == t
        np.testing.assert_allclose(feats[i, :t], ref, rtol=1e-4, atol=1e-3)


def test_energy_vad_batch_matches_single():
    cfg = F.MfccConfig(dither=0.0)
    lens = [8000, 3000, 11000]
    waves, n = _ragged_waves(lens, seed=1)
    feats, mask = F.mfcc_batch(waves, n, cfg)
    vad = np.asarray(F.energy_vad_batch(feats, mask))
    for i, ln in enumerate(lens):
        t = F.num_frames(ln, cfg)
        ref = np.asarray(F.energy_vad(np.asarray(feats)[i, :t]))
        np.testing.assert_array_equal(vad[i, :t], ref)
        assert not vad[i, t:].any()


@pytest.mark.parametrize("window,center", [(300, True), (10, True),
                                           (300, False)])
def test_sliding_cmvn_batch_matches_single(window, center):
    cfg = F.MfccConfig(dither=0.0)
    lens = [8000, 2000, 20000, 900]   # incl. t < window and t > window
    waves, n = _ragged_waves(lens, seed=2)
    feats, mask = F.mfcc_batch(waves, n, cfg)
    out = np.asarray(F.sliding_cmvn_batch(feats, mask, window=window,
                                          center=center))
    for i, ln in enumerate(lens):
        t = F.num_frames(ln, cfg)
        ref = np.asarray(F.sliding_cmvn(np.asarray(feats)[i, :t],
                                        window=window, center=center))
        np.testing.assert_allclose(out[i, :t], ref, rtol=1e-4, atol=2e-3)
        if t < out.shape[1]:
            assert np.abs(out[i, t:]).max() == 0.0


def test_compact_voiced_matches_host_selection():
    rng = np.random.RandomState(3)
    feats = rng.randn(3, 50, 7).astype(np.float32)
    vad = (rng.rand(3, 50) > 0.4).astype(np.float32)
    vad[1, 40:] = 0.0                         # padding region
    out, new_mask = F.compact_voiced(feats, vad)
    out, new_mask = np.asarray(out), np.asarray(new_mask)
    for i in range(3):
        ref = F.select_voiced_frames(feats[i], vad[i])
        k = ref.shape[0]
        assert new_mask[i].sum() == k
        np.testing.assert_array_equal(out[i, :k], ref)
        assert np.abs(out[i, k:]).max() == 0.0
