"""Extractor tests: chunk-and-average parity with a naive per-utterance
reference computation, bucketing/batching correctness, edge cases."""

import jax
import numpy as np
import pytest

from xvector_tpu.extract.extractor import (ExtractorConfig, XvectorExtractor,
                                           preprocess, speaker_means)
from xvector_tpu.models import tdnn

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def model():
    cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(KEY, cfg, num_classes=7)
    return cfg, params, state


def _naive_xvector(model, feats, min_chunk, max_chunk):
    """Reference semantics (models.py:396-421): consecutive chunks of
    ≤max_chunk, drop tail <min_chunk, frame-weighted average; each chunk
    forwarded unpadded at batch 1."""
    cfg, params, state = model
    total, weight = 0.0, 0.0
    for off in range(0, feats.shape[0], max_chunk):
        ln = min(max_chunk, feats.shape[0] - off)
        if ln < min_chunk:
            continue
        xv = np.asarray(tdnn.extract_xvector(
            cfg, params, state, feats[None, off:off + ln]))[0]
        total = total + ln * xv
        weight += ln
    return (total / weight).astype(np.float32)


def test_matches_naive_reference(model):
    cfg, params, state = model
    ex = XvectorExtractor(cfg, params, state,
                          ExtractorConfig(min_chunk=25, max_chunk=100,
                                          batch_size=4,
                                          buckets=(32, 64, 128)))
    rng = np.random.RandomState(0)
    utts = {f"u{i}": rng.randn(40 + 57 * i, 23).astype(np.float32)
            for i in range(5)}
    got = ex.extract(utts.items())
    assert set(got) == set(utts)
    for k, feats in utts.items():
        want = _naive_xvector(model, feats, 25, 100)
        np.testing.assert_allclose(got[k], want, rtol=1e-3, atol=1e-3)


def test_short_utterance_skipped(model):
    cfg, params, state = model
    ex = XvectorExtractor(cfg, params, state,
                          ExtractorConfig(min_chunk=25, max_chunk=100,
                                          batch_size=2, buckets=(128,)))
    rng = np.random.RandomState(1)
    got = ex.extract([("tiny", rng.randn(10, 23).astype(np.float32)),
                      ("ok", rng.randn(50, 23).astype(np.float32))])
    assert "tiny" not in got and "ok" in got


def test_long_utterance_chunked(model):
    cfg, params, state = model
    ex = XvectorExtractor(cfg, params, state,
                          ExtractorConfig(min_chunk=25, max_chunk=64,
                                          batch_size=8, buckets=(64,)))
    rng = np.random.RandomState(2)
    feats = rng.randn(200, 23).astype(np.float32)   # 64+64+64+8: tail drop
    got = ex.extract([("long", feats)])
    want = _naive_xvector(model, feats, 25, 64)
    np.testing.assert_allclose(got["long"], want, rtol=1e-3, atol=1e-3)


def test_streaming_yields_all(model):
    cfg, params, state = model
    ex = XvectorExtractor(cfg, params, state,
                          ExtractorConfig(min_chunk=25, max_chunk=50,
                                          batch_size=3, buckets=(64,)))
    rng = np.random.RandomState(3)
    n = 11
    stream = ((f"u{i}", rng.randn(30 + 7 * i, 23).astype(np.float32))
              for i in range(n))
    seen = [k for k, _ in ex.extract_iter(stream)]
    assert sorted(seen) == sorted(f"u{i}" for i in range(n))


def test_preprocess_applies_cmvn_and_vad():
    rng = np.random.RandomState(4)
    feats = rng.randn(400, 23).astype(np.float32) + 7.0
    vad = (rng.rand(400) > 0.3).astype(np.float32)
    out = preprocess(feats, cmvn_window=300, vad=vad)
    assert out.shape[0] == int(vad.sum())
    assert abs(out.mean()) < 0.5     # centering removed the +7 offset


def test_speaker_means():
    xv = {"u1": np.ones(4, np.float32), "u2": 3 * np.ones(4, np.float32),
          "u3": np.zeros(4, np.float32)}
    u2s = {"u1": "a", "u2": "a", "u3": "b"}
    means, counts = speaker_means(xv, u2s)
    np.testing.assert_allclose(means["a"], 2 * np.ones(4))
    assert counts == {"a": 2, "b": 1}


def test_scan_dispatch_path_matches(model):
    """Enough same-bucket chunks to trigger the multi-batch scanned
    dispatch; results must match the per-batch path exactly."""
    cfg, params, state = model
    rng = np.random.RandomState(9)
    utts = {f"u{i}": rng.randn(90, 23).astype(np.float32)
            for i in range(24)}   # 24 chunks, batch 4, depth 2 → 3 scans
    common = dict(min_chunk=25, max_chunk=100, batch_size=4,
                  buckets=(128,))
    scan_ex = XvectorExtractor(cfg, params, state,
                               ExtractorConfig(dispatch_depth=2, **common))
    solo_ex = XvectorExtractor(cfg, params, state,
                               ExtractorConfig(dispatch_depth=1, **common))
    a = scan_ex.extract(utts.items())
    b = solo_ex.extract(utts.items())
    assert set(a) == set(utts)
    for k in utts:
        # scanned vs standalone compilation differ only in f32
        # reduction order
        np.testing.assert_allclose(a[k], b[k], rtol=1e-3, atol=1e-3)


def test_attention_pooling_extraction():
    """The attention-pooling variant extracts through the same bucketed
    pipeline (its pooled dim differs from stats pooling)."""
    from dataclasses import replace
    cfg = replace(tdnn.MODEL_ZOO["l2_lrelu_attention"],
                  channels=(8, 8, 8, 8, 16), embed_dims=(12, 12),
                  feat_dim=23)
    params, state = tdnn.init_params(jax.random.PRNGKey(5), cfg, 5)
    ex = XvectorExtractor(cfg, params, state,
                          ExtractorConfig(min_chunk=25, max_chunk=100,
                                          batch_size=2, buckets=(64, 128)))
    rng = np.random.RandomState(6)
    a = rng.randn(60, 23).astype(np.float32)
    b = rng.randn(110, 23).astype(np.float32)
    got = ex.extract([("a", a), ("b", b)])
    assert got["a"].shape == (12,)
    # single-chunk utterance: must equal the direct unpadded forward
    want = np.asarray(tdnn.extract_xvector(cfg, params, state, a[None]))[0]
    np.testing.assert_allclose(got["a"], want, rtol=1e-3, atol=1e-3)


def test_fused_kernel_extraction_matches(model):
    """use_fused=True routes the frame stack through the Pallas kernel
    (interpreted by pallas on CPU via the XLA fallback inside
    fused_frame_stack); x-vectors must match the default path closely."""
    cfg, params, state = model
    rng = np.random.RandomState(11)
    utts = {f"u{i}": rng.randn(120, 23).astype(np.float32)
            for i in range(6)}
    common = dict(min_chunk=25, max_chunk=200, batch_size=3, buckets=(128,))
    plain = XvectorExtractor(cfg, params, state,
                             ExtractorConfig(**common))
    fused = XvectorExtractor(cfg, params, state,
                             ExtractorConfig(use_fused=True, **common))
    a = plain.extract(utts.items())
    b = fused.extract(utts.items())
    assert set(b) == set(utts)
    for k in utts:
        # fused path computes in bf16 matmul / f32 accum; default test
        # config is f32 — compare direction + magnitude at vector scale
        # rather than elementwise (bf16 noise on near-zero elements)
        cos = np.dot(a[k], b[k]) / (np.linalg.norm(a[k])
                                    * np.linalg.norm(b[k]))
        assert cos > 0.9995, cos
        assert np.abs(a[k] - b[k]).max() < 0.02 * np.abs(a[k]).max()


def test_fused_rejects_unsupported_topology():
    from dataclasses import replace
    cfg = replace(tdnn.MODEL_ZOO["l2_lrelu_attention"],
                  channels=(32, 32, 32, 32, 6 * 16), embed_dims=(64, 64))
    params, state = tdnn.init_params(KEY, cfg, num_classes=7)
    with pytest.raises(ValueError):
        XvectorExtractor(cfg, params, state,
                         ExtractorConfig(use_fused=True))


def test_wave_to_xvector_matches_stepwise_chain():
    """The one-dispatch wave→x-vector program must equal the step-by-step
    host chain (mfcc → energy VAD → sliding CMVN → select-voiced →
    forward) per utterance."""
    import jax.numpy as jnp
    from xvector_tpu.ops import features as F
    from xvector_tpu.extract.extractor import make_wave_to_xvector

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 8)
    mfcc_cfg = F.MfccConfig(dither=0.0)
    fn = make_wave_to_xvector(cfg, mfcc_cfg, compute_dtype=jnp.float32)

    rng = np.random.RandomState(0)
    lens = [8000, 4400, 16000]
    waves = np.zeros((3, 16000), np.float32)
    for i, n in enumerate(lens):
        waves[i, :n] = (rng.randn(n) * 2000).astype(np.float32)

    xv, nframes = fn(params, state, jnp.asarray(waves),
                     jnp.asarray(lens, np.int32))
    xv, nframes = np.asarray(xv), np.asarray(nframes)

    for i, n in enumerate(lens):
        feats = np.asarray(F.mfcc(waves[i, :n], mfcc_cfg))
        vad = np.asarray(F.energy_vad(feats))
        feats = np.asarray(F.sliding_cmvn(feats))
        voiced = F.select_voiced_frames(feats, vad)
        assert nframes[i] == voiced.shape[0] > 0
        ref = np.asarray(tdnn.extract_xvector(
            cfg, params, state, jnp.asarray(voiced[None])))[0]
        np.testing.assert_allclose(xv[i], ref, rtol=2e-3, atol=2e-3)


def test_wave_extractor_matches_feature_path():
    """WaveExtractor (the production --from-wav mode) must agree with the
    explicit host chain + feature extractor on <= max_chunk utterances,
    across mixed length buckets and batch boundaries."""
    import jax.numpy as jnp
    from xvector_tpu.ops import features as F
    from xvector_tpu.extract.extractor import (WaveExtractor,
                                               WaveExtractorConfig)

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 8)
    rng = np.random.RandomState(1)
    utts = {f"u{i}": (rng.randn(n) * 2000).astype(np.float32)
            for i, n in enumerate([8000, 4000, 23000, 8000, 15999, 6000])}

    wex = WaveExtractor(cfg, params, state,
                        WaveExtractorConfig(batch_size=2,
                                            compute_dtype="float32"))
    got = wex.extract(iter(utts.items()))

    mfcc_cfg = F.MfccConfig(dither=0.0)
    want = {}
    for utt, wave in utts.items():
        feats = np.asarray(F.mfcc(wave, mfcc_cfg))
        vad = np.asarray(F.energy_vad(feats))
        feats = np.asarray(F.sliding_cmvn(feats))
        voiced = F.select_voiced_frames(feats, vad)
        if voiced.shape[0] < 25:
            continue
        want[utt] = np.asarray(tdnn.extract_xvector(
            cfg, params, state, voiced[None],
            compute_dtype=jnp.float32))[0]
    assert set(got) == set(want)
    for utt in want:
        np.testing.assert_allclose(got[utt], want[utt], rtol=1e-3,
                                   atol=2e-3)


def test_wave_extractor_long_utterance_falls_back_to_chunking():
    """> max_chunk frames: the wave extractor must reproduce the feature
    extractor's chunk-and-average protocol (CMVN/VAD over the FULL
    utterance first, reference models.py:396-421)."""
    import jax.numpy as jnp
    from xvector_tpu.ops import features as F
    from xvector_tpu.extract.extractor import (WaveExtractor,
                                               WaveExtractorConfig,
                                               preprocess)

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 8)
    rng = np.random.RandomState(2)
    wave = (rng.randn(60000) * 2000).astype(np.float32)  # 7.5 s

    wcfg = WaveExtractorConfig(max_chunk=300, batch_size=4,
                               compute_dtype="float32")
    wex = WaveExtractor(cfg, params, state, wcfg)
    got = wex.extract(iter([("long", wave)]))

    mfcc_cfg = F.MfccConfig(dither=0.0)
    feats = np.asarray(F.mfcc(wave, mfcc_cfg))
    vad = np.asarray(F.energy_vad(feats))
    feats = preprocess(feats, vad=vad)
    ref_ex = XvectorExtractor(cfg, params, state,
                              ExtractorConfig(max_chunk=300,
                                              compute_dtype="float32"))
    want = ref_ex.extract(iter([("long", feats)]))
    np.testing.assert_allclose(got["long"], want["long"], rtol=1e-4,
                               atol=1e-4)


def test_wave_extractor_skips_silence():
    from xvector_tpu.extract.extractor import (WaveExtractor,
                                               WaveExtractorConfig)
    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 8)
    rng = np.random.RandomState(3)
    wex = WaveExtractor(cfg, params, state,
                        WaveExtractorConfig(batch_size=2,
                                            compute_dtype="float32"))
    out = wex.extract(iter([
        ("silence", np.zeros(8000, np.float32)),
        ("speech", (rng.randn(8000) * 2000).astype(np.float32))]))
    assert "silence" not in out and "speech" in out
    assert np.isfinite(out["speech"]).all()
