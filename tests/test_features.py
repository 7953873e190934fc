"""Feature front-end tests: MFCC vs an independent numpy oracle built
straight from the published Kaldi formulas (sharing NO constants with the
implementation), frozen golden fixtures, VAD and sliding-CMVN
property/edge-case checks.

The oracle below re-derives every constant — povey window, mel filterbank
geometry, orthonormal DCT-II, cepstral lifter — from the formulas in
Kaldi's feat/feature-window.cc, feat/mel-computations.cc and
feat/feature-functions.cc, with the knob values of the reference's
``conf/mfcc.conf:1-6`` (8 kHz, 25/10 ms, 23 ceps, 20-3700 Hz,
snip-edges=false) and ``conf/vad.conf:1-4``.  A constant-level deviation
in the implementation (mel edge placement, window power, DCT norm) now
fails these tests instead of silently shifting SRE16 EER.
"""

import math
import os

import numpy as np
import pytest

from xvector_tpu.ops import features as F

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


# ---------------------------------------------------------------------------
# Independent Kaldi-formula oracle (f64 throughout; no imports from the
# implementation beyond the config dataclass's knob values).
# ---------------------------------------------------------------------------

def _oracle_povey_window(n):
    # feature-window.cc: hann^0.85 with denominator N-1
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))) ** 0.85


def _oracle_mel(f):
    # mel-computations.cc: MelScale
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _oracle_mel_banks(num_bins, fft_size, sample_rate, low, high):
    # mel-computations.cc MelBanks: num_bins triangles, edges spaced
    # uniformly in mel between mel(low) and mel(high); FFT bins
    # 0..fft_size/2-1 (nyquist excluded)
    mel_low, mel_high = _oracle_mel(low), _oracle_mel(high)
    delta = (mel_high - mel_low) / (num_bins + 1)
    freqs = np.arange(fft_size // 2, dtype=np.float64) \
        * (sample_rate / fft_size)
    mel_f = _oracle_mel(freqs)
    banks = np.zeros((num_bins, fft_size // 2))
    for b in range(num_bins):
        lo, ce, hi = (mel_low + (b + k) * delta for k in (0, 1, 2))
        up = (mel_f - lo) / (ce - lo)
        down = (hi - mel_f) / (hi - ce)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return banks


def _oracle_dct(num_ceps, num_bins):
    # matrix-functions.cc ComputeDctMatrix (orthonormal DCT-II)
    j = np.arange(num_bins, dtype=np.float64)
    rows = [np.full(num_bins, 1.0 / math.sqrt(num_bins))]
    for k in range(1, num_ceps):
        rows.append(math.sqrt(2.0 / num_bins)
                    * np.cos(math.pi * k * (2 * j + 1) / (2 * num_bins)))
    return np.stack(rows)


def _oracle_lifter(num_ceps, q):
    # feature-mfcc.cc ComputeLifterCoeffs
    i = np.arange(num_ceps, dtype=np.float64)
    return 1.0 + 0.5 * q * np.sin(np.pi * i / q)


def _numpy_mfcc(wave, cfg: F.MfccConfig):
    """f64 Kaldi-semantics MFCC from first principles (dither off)."""
    assert cfg.dither == 0.0
    sr = cfg.sample_rate
    win = int(sr * cfg.frame_length_ms / 1000.0)
    shift = int(sr * cfg.frame_shift_ms / 1000.0)
    fft_size = 1
    while fft_size < win:
        fft_size *= 2
    n = len(wave)
    eps = np.finfo(np.float32).eps
    if cfg.snip_edges:
        t = 1 + (n - win) // shift if n >= win else 0
        starts = np.arange(t) * shift
    else:
        # feature-window.cc FirstSampleOfFrame/NumFrames (snip-edges=false)
        t = (n + shift // 2) // shift
        starts = np.arange(t) * shift + shift // 2 - win // 2
    window = _oracle_povey_window(win)
    high = cfg.high_freq if cfg.high_freq > 0 else sr / 2 + cfg.high_freq
    banks = _oracle_mel_banks(cfg.num_mel_bins, fft_size, sr,
                              cfg.low_freq, high)
    dct = _oracle_dct(cfg.num_ceps, cfg.num_mel_bins)
    lift = _oracle_lifter(cfg.num_ceps, cfg.cepstral_lifter)
    feats = []
    for s in starts:
        idx = np.arange(s, s + win)
        idx = np.where(idx < 0, -idx - 1, idx)       # reflect at start
        idx = np.where(idx >= n, 2 * n - idx - 1, idx)  # reflect at end
        frame = wave[idx].astype(np.float64)
        if cfg.remove_dc_offset:
            frame = frame - frame.mean()
        log_e = math.log(max(np.dot(frame, frame), eps))  # raw energy
        if cfg.preemph:
            pre = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - cfg.preemph * pre
        frame = frame * window
        spec = np.fft.rfft(frame, fft_size)
        power = np.abs(spec[: fft_size // 2]) ** 2
        logmel = np.log(np.maximum(banks @ power, eps))
        c = (dct @ logmel) * lift
        if cfg.use_energy:
            c[0] = log_e
        feats.append(c)
    return np.array(feats, dtype=np.float64)


def _numpy_energy_vad(feats, vcfg: F.VadConfig):
    """Kaldi ivector/voice-activity-detection.cc from first principles."""
    log_e = feats[:, 0].astype(np.float64)
    thresh = vcfg.energy_threshold
    if vcfg.energy_mean_scale != 0.0:
        thresh = thresh + vcfg.energy_mean_scale * log_e.mean()
    t = len(log_e)
    out = np.zeros(t, np.float64)
    for i in range(t):
        lo = max(0, i - vcfg.frames_context)
        hi = min(t, i + vcfg.frames_context + 1)
        num = float((log_e[lo:hi] > thresh).sum())
        den = float(hi - lo)
        out[i] = 1.0 if num >= den * vcfg.proportion_threshold else 0.0
    return out


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
    banks = _oracle_mel_banks(cfg.num_mel_bins, cfg.fft_size,
                              cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    # recover log-mel by inverting the (orthogonal-rows) DCT
    feats = np.asarray(F.mfcc(wave, cfg))
    dct = _oracle_dct(cfg.num_ceps, cfg.num_mel_bins)
    logmel = feats @ np.linalg.pinv(dct).T
    freq_bin = int(1000 / (cfg.sample_rate / cfg.fft_size))
    expect_bin = int(np.argmax(banks[:, freq_bin]))
    assert abs(int(np.argmax(logmel.mean(0))) - expect_bin) <= 1


# ---------------------------------------------------------------------------
# Frozen golden fixtures: (wave, f64 oracle MFCC, VAD decisions, CMVN rows)
# committed in tests/golden/feature_golden.npz.  Regenerate ONLY with
# tests/golden/make_feature_golden.py after verifying a deliberate
# semantics change; the point is that neither the implementation nor the
# in-repo oracle can drift without a test failing.
# ---------------------------------------------------------------------------

def _load_golden():
    path = os.path.join(_GOLDEN_DIR, "feature_golden.npz")
    assert os.path.exists(path), "golden fixtures missing from repo"
    return np.load(path)


def test_golden_fixtures_match_oracle():
    """The in-repo oracle must reproduce the frozen f64 rows ~exactly."""
    g = _load_golden()
    cfg = F.MfccConfig(dither=0.0)
    for i in range(int(g["n_cases"])):
        wave = g[f"wave_{i}"]
        want = g[f"mfcc_{i}"]
        got = _numpy_mfcc(wave, cfg)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("case", [0, 1, 2])
def test_mfcc_matches_golden(case):
    g = _load_golden()
    cfg = F.MfccConfig(dither=0.0)
    wave = g[f"wave_{case}"]
    want = g[f"mfcc_{case}"]
    got = np.asarray(F.mfcc(wave.astype(np.float32), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("case", [0, 1, 2])
def test_vad_matches_golden(case):
    # VAD is checked on the frozen MFCC rows so the test isolates the VAD
    # op (the generator asserts every frame has decision margin, so f32
    # rounding cannot flip it)
    g = _load_golden()
    feats = g[f"mfcc_{case}"].astype(np.float32)
    got = np.asarray(F.energy_vad(feats))
    np.testing.assert_array_equal(got, g[f"vad_{case}"])


def test_vad_matches_independent_oracle():
    rng = np.random.RandomState(11)
    feats = rng.randn(400, 23).astype(np.float32) * 3.0
    feats[:, 0] = rng.randn(400) * 4.0 + 2.0
    vcfg = F.VadConfig()
    got = np.asarray(F.energy_vad(feats, vcfg))
    want = _numpy_energy_vad(feats, vcfg)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", [0, 2])
def test_sliding_cmvn_matches_golden_edges(case):
    """Golden CMVN rows pin the clamped-window EDGE behaviour (first /
    centre / last frames) where implementations typically diverge.  Input
    is the frozen MFCC so the test isolates the CMVN op."""
    g = _load_golden()
    feats = g[f"mfcc_{case}"].astype(np.float32)
    got = np.asarray(F.sliding_cmvn(feats, window=300, center=True))
    rows = g[f"cmvn_rows_{case}"].astype(int)
    want = g[f"cmvn_{case}"]
    np.testing.assert_allclose(got[rows], want, rtol=2e-4, atol=2e-3)


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


def test_mfcc_batch_dc_offset_heavy():
    """DC offset >> AC power (quiet audio on a biased channel): the folded
    fast path's energy must be computed from mean-subtracted samples, NOT
    the algebraically equal sum(x^2)-sum(x)^2/L which cancels
    catastrophically in f32 (ADVICE r4: up to 1.36 nats of C0 error).
    The batch row must match the single-utterance path, which mean-subtracts
    before squaring."""
    cfg = F.MfccConfig(dither=0.0)
    rng = np.random.RandomState(7)
    lens = [8000, 4000]
    s = max(lens)
    waves = np.zeros((len(lens), s), np.float32)
    for i, ln in enumerate(lens):
        waves[i, :ln] = (8000.0 + 5.0 * rng.randn(ln)).astype(np.float32)
    n = np.asarray(lens, np.int32)
    feats, mask = F.mfcc_batch(waves, n, cfg)
    feats = np.asarray(feats)
    for i, ln in enumerate(lens):
        ref = np.asarray(F.mfcc(waves[i, :ln], cfg))
        t = ref.shape[0]
        assert np.asarray(mask)[i].sum() == t
        np.testing.assert_allclose(feats[i, :t], ref, rtol=1e-4, atol=2e-3)


def test_mfcc_batch_buffer_shorter_than_reflection():
    """A batch whose padded buffer is narrower than the snip-edges=false
    left-reflection width (60 samples at 8 kHz defaults) must not crash
    the bulk framing path and must still match the single-utterance
    reference (every frame is rewritten by the exact tail-fix gather)."""
    cfg = F.MfccConfig(dither=0.0)
    lens = [50, 30]                           # buffer S=50 < lpad=60
    waves, n = _ragged_waves(lens, seed=9)
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


def test_sliding_cmvn_batch_long_utterance_accuracy():
    """~10k frames: the cumsum-differencing batch path must track the
    reduce_window single-utterance path within the claimed accuracy even
    when prefix sums grow large (ADVICE r1: previously only ~2k frames
    were covered)."""
    cfg = F.MfccConfig(dither=0.0)
    waves, n = _ragged_waves([800_640, 500_000], seed=7)  # ~10k / ~6k frames
    feats, mask = F.mfcc_batch(waves, n, cfg)
    out = np.asarray(F.sliding_cmvn_batch(feats, mask, window=300))
    for i, ln in enumerate([800_640, 500_000]):
        t = F.num_frames(ln, cfg)
        ref = np.asarray(F.sliding_cmvn(np.asarray(feats)[i, :t],
                                        window=300))
        np.testing.assert_allclose(out[i, :t], ref, rtol=1e-4, atol=2e-3)


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


def test_dct_matrix_matches_scipy():
    """Cross-check the production DCT matrix against scipy's orthonormal
    DCT-II — an implementation neither this repo nor the oracle authored.
    (The spectrum stage is already cross-checked against np.fft.rfft in
    the oracle; the mel bank and the povey window's hann base are
    cross-checked against tf.signal below; after those, only the ^0.85
    povey exponent — a one-token Kaldi constant — remains oracle-only.)"""
    import scipy.fft
    from xvector_tpu.ops.features import _dct_matrix

    num_ceps, num_bins = 13, 23
    ours = _dct_matrix(num_ceps, num_bins)
    # scipy: dct(eye, type 2, norm="ortho") rows are the orthonormal
    # DCT-II basis — exactly Kaldi's ComputeDctMatrix convention
    ref = scipy.fft.dct(np.eye(num_bins), type=2, norm="ortho",
                        axis=1)[:, :num_ceps].T
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _tf_eval(tf, t):
    """Evaluate a tf tensor whether eager is on or another test module has
    called ``tf.compat.v1.disable_v2_behavior()`` (graph mode)."""
    if hasattr(t, "numpy") and tf.executing_eagerly():
        return t.numpy()
    with tf.compat.v1.Session() as sess:
        return sess.run(t)


def test_mel_banks_match_tf_signal():
    """Cross-check the Kaldi-layout mel filterbank against
    ``tf.signal.linear_to_mel_weight_matrix`` — an independent
    implementation of the same HTK-mel triangle construction
    (slopes computed in the mel domain, edges uniform in mel between
    mel(low) and mel(high); mel-computations.cc MelBanks).  Layout
    differences bridged here, not in the implementations: tf is
    (num_spectrogram_bins, num_mel) including the nyquist bin and
    1127.01048-exact (2595·log10); ours is (num_mel, fft//2)
    nyquist-excluded with Kaldi's rounded 1127.0 — worst-case weight
    difference from the constant is ~3e-6 at 8 kHz."""
    tf = pytest.importorskip("tensorflow")
    cfg = F.MfccConfig()        # 8 kHz, fft 256, 23 bins, 20–3700 Hz
    ours = F._mel_banks(cfg)
    tfm = _tf_eval(tf, tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=cfg.num_mel_bins,
        num_spectrogram_bins=cfg.fft_size // 2 + 1,
        sample_rate=cfg.sample_rate,
        lower_edge_hertz=float(cfg.low_freq),
        upper_edge_hertz=float(cfg.high_freq),
        dtype=tf.float64))
    ref = tfm[:cfg.fft_size // 2].T          # drop nyquist, (23, 128)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and the nyquist column our layout drops really carries no weight
    # at these edge frequencies (high_freq 3700 < 4000)
    assert np.abs(tfm[cfg.fft_size // 2]).max() == 0.0


def test_povey_window_base_matches_tf_hann():
    """The povey window is hann^0.85 with the N-1 denominator
    (feature-window.cc).  ``tf.signal.hann_window(periodic=False)`` is an
    independent implementation of exactly that hann base — this pins the
    subtle part (symmetric N-1 denominator, not the periodic-N FFT
    convention); the ^0.85 exponent is applied to both sides."""
    tf = pytest.importorskip("tensorflow")
    cfg = F.MfccConfig()
    ours = F._window_fn(cfg)
    hann = _tf_eval(tf, tf.signal.hann_window(cfg.frame_length,
                                               periodic=False,
                                               dtype=tf.float64))
    np.testing.assert_allclose(ours, hann ** 0.85, atol=1e-6)
    # the wrong (periodic) convention is measurably different — the
    # cross-check has teeth
    per = _tf_eval(tf, tf.signal.hann_window(cfg.frame_length,
                                              periodic=True,
                                              dtype=tf.float64))
    assert np.abs(per ** 0.85 - ours).max() > 1e-3


@pytest.mark.parametrize("kw", [
    dict(raw_energy=False),                  # legacy frames-chain path
    dict(remove_dc_offset=False),            # fold without the rank-1 term
    dict(preemph=0.0),                       # fold without the band term
    dict(use_energy=False, cepstral_lifter=0.0),
    dict(raw_energy=False, use_energy=False),  # fast path (energy unused)
    dict(snip_edges=True),
], ids=["raw_energy_off", "no_dc", "no_preemph", "no_energy",
        "no_raw_no_energy", "snip_edges"])
def test_mfcc_batch_matches_single_config_variants(kw):
    """The folded fast path folds a DIFFERENT matrix per config flag
    (and raw_energy=False takes the frames-chain path entirely) — each
    variant must still match the single-utterance reference per row."""
    cfg = F.MfccConfig(dither=0.0, **kw)
    lens = [8000, 5000, 123]
    waves, n = _ragged_waves(lens, seed=11)
    feats, mask = F.mfcc_batch(waves, n, cfg)
    feats = np.asarray(feats)
    for i, ln in enumerate(lens):
        ref = np.asarray(F.mfcc(waves[i, :ln], cfg))
        t = ref.shape[0]
        assert np.asarray(mask)[i].sum() == t
        np.testing.assert_allclose(feats[i, :t], ref, rtol=1e-4, atol=1e-3)


def test_mfcc_batch_dither_deterministic_and_bounded():
    """Dither draws are keyed: the same key reproduces bit-identical
    features (incl. the short rows whose every frame is tail-fixed),
    a different key does not, and the dithered output stays near the
    clean one (dither 1.0 against int16-scale audio)."""
    import jax
    cfg = F.MfccConfig()                      # dither=1.0
    lens = [8000, 300]                        # 300 samples: all-tail row
    waves, n = _ragged_waves(lens, seed=3)
    a1, _ = F.mfcc_batch(waves, n, cfg, key=jax.random.PRNGKey(5))
    a2, _ = F.mfcc_batch(waves, n, cfg, key=jax.random.PRNGKey(5))
    b1, _ = F.mfcc_batch(waves, n, cfg, key=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(a1) - np.asarray(b1)).max() > 0.0
    clean, mask = F.mfcc_batch(waves, n, F.MfccConfig(dither=0.0))
    d = np.abs(np.asarray(a1) - np.asarray(clean)) * np.asarray(mask)[..., None]
    assert d.max() < 1.0                      # noise, not corruption
