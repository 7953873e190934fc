"""Headline benchmark: training throughput in audio-seconds/s/chip.

Measures the full jitted train step (forward + backward + Adam + BN EMA) on
the parity model (ModelWithoutDropout: 5×conv + stats pooling + 2×FC +
~7k-speaker softmax) at the recipe's working point: minibatch 64, 300-frame
chunks (10 ms shift ⇒ 3 s audio/chunk), 23-dim MFCC — run_xvector.sh:47-59.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_s/s/chip", "vs_baseline": N,
   extra keys: extract_embeddings_per_s, step_ms, device}

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md), so the baseline is this framework's first recorded run,
persisted to BENCH_BASELINE.json — i.e. the number tracks regressions/
improvements across rounds (1.0 on the first run).
"""

import json
import os
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")

NUM_SPEAKERS = 7185          # SRE-scale speaker count (SURVEY §6)
MINIBATCH = 64               # run_xvector.sh:47
FRAMES = 304                 # ~recipe mean chunk (200-400), bucketed
FEAT_DIM = 23
FRAME_SHIFT_S = 0.01
STEPS = 256


def bench_train(jax, jnp):
    """Block-scan training path (the production hot loop): BLOCK stacked
    minibatches per device dispatch.  Timing is forced-synced by pulling a
    scalar to host — block_until_ready does not actually block on the
    tunnel transport this chip sits behind."""
    from xvector_tpu.models import tdnn
    from xvector_tpu.train.trainer import TrainConfig, make_block_train_step
    import optax

    block = 16
    cfg = TrainConfig(model="no_dropout", num_targets=NUM_SPEAKERS,
                      compute_dtype="bfloat16", block_size=block,
                      fused_conv_bwd=jax.default_backend() == "tpu")
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg,
                                     NUM_SPEAKERS)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = opt.init(params)
    # dense=True: the bench blocks are full (no pad frames/rows), which
    # is what the trainer's host-side dispatch selects in production for
    # bucketed archives (tools/bench_dense.py: 3.99 -> 3.71 ms, +6.9%)
    step = make_block_train_step(model_cfg, cfg, opt, dense=True)

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(block, MINIBATCH, FRAMES, FEAT_DIM)
                     .astype(np.float16))
    ys = jnp.asarray(rng.randint(0, NUM_SPEAKERS, (block, MINIBATCH))
                     .astype(np.int32))
    t_lens = jnp.full((block,), FRAMES, jnp.int32)
    n_rows = jnp.full((block,), MINIBATCH, jnp.int32)
    lr = jnp.float32(1e-3)
    keep = jnp.float32(1.0)
    shrink = jnp.float32(1.0)
    key = jax.random.PRNGKey(1)

    def sync(m):
        np.asarray(m["loss"])          # forces the whole queue to drain

    # warmup/compile (first call may remote-compile for minutes; the
    # persistent cache makes later runs fast)
    params, opt_state, state, m = step(params, opt_state, state, xs, ys,
                                       t_lens, n_rows, lr, keep, shrink,
                                       key)
    sync(m)
    # The tunnel transport shows large transient stalls right after
    # compiles; measure several rounds and report the best steady state.
    n_blocks = max(STEPS // block, 2)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            params, opt_state, state, m = step(params, opt_state, state,
                                               xs, ys, t_lens, n_rows, lr,
                                               keep, shrink, key)
        sync(m)
        best = min(best, (time.perf_counter() - t0) / (n_blocks * block))
    audio_s = MINIBATCH * FRAMES * FRAME_SHIFT_S
    return audio_s / best, best * 1e3


def _measure_train_step(jax, jnp, model: str, head: str = "softmax",
                        rounds: int = 3, blocks: int = 8,
                        dense: bool = True, optimizer_factory=None,
                        return_detail: bool = False):
    """ms-per-minibatch timing of the block train step for one
    (topology, head).  THE one honest-timing harness (sync by scalar
    pull, best-of-rounds, 16-minibatch blocks per dispatch) — the perf
    tools (tools/bench_dense.py, tools/bench_adam_mu.py) parameterize
    this instead of carrying their own copies.

    ``dense`` selects the mask-free twin (the production dispatch for
    full blocks); ``optimizer_factory()`` overrides the optax transform;
    ``return_detail`` also returns (compile_s, last_loss)."""
    from xvector_tpu.models import tdnn
    from xvector_tpu.train.trainer import TrainConfig, make_block_train_step
    import optax

    block = 16
    cfg = TrainConfig(model=model, num_targets=NUM_SPEAKERS,
                      compute_dtype="bfloat16", block_size=block,
                      head=head,
                      fused_conv_bwd=jax.default_backend() == "tpu")
    model_cfg = tdnn.MODEL_ZOO[model]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg,
                                     NUM_SPEAKERS)
    opt = (optimizer_factory() if optimizer_factory is not None else
           optax.inject_hyperparams(optax.adam)(learning_rate=1e-3))
    opt_state = opt.init(params)
    step = make_block_train_step(model_cfg, cfg, opt, dense=dense)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(block, MINIBATCH, FRAMES, FEAT_DIM)
                     .astype(np.float16))
    ys = jnp.asarray(rng.randint(0, NUM_SPEAKERS, (block, MINIBATCH))
                     .astype(np.int32))
    args = (jnp.full((block,), FRAMES, jnp.int32),
            jnp.full((block,), MINIBATCH, jnp.int32),
            jnp.float32(1e-3), jnp.float32(1.0), jnp.float32(1.0),
            jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    params, opt_state, state, m = step(params, opt_state, state, xs, ys,
                                       *args)
    np.asarray(m["loss"])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(blocks):
            params, opt_state, state, m = step(params, opt_state, state,
                                               xs, ys, *args)
        np.asarray(m["loss"])
        best = min(best, (time.perf_counter() - t0) / (blocks * block))
    if return_detail:
        return best, compile_s, float(np.asarray(m["loss"]))
    return best


def bench_variants(jax, jnp):
    """Per-topology/head train throughput (audio_s/s/chip) so a variant
    regression is visible between rounds: E-TDNN (dilated), attention
    pooling, AM-softmax head (VERDICT r1 weak #8)."""
    audio_s = MINIBATCH * FRAMES * FRAME_SHIFT_S
    out = {}
    for name, model, head in (
            ("etdnn", "etdnn", "softmax"),
            ("attention", "l2_lrelu_attention", "softmax"),
            ("am_softmax", "no_dropout", "am_softmax")):
        out[f"train_{name}_audio_s_per_s"] = round(
            audio_s / _measure_train_step(jax, jnp, model, head), 1)
    return out


def bench_features(jax, jnp):
    """Batched featurization (mfcc_batch + energy_vad_batch) throughput
    in audio-seconds/s — the corpus-scale make_features path.

    Methodology (changed round 4): the front-end's device time
    (~0.24 ms for 16×8 s) is far below this tunnel's ~4 ms/dispatch
    floor, so a per-dispatch measurement reports transport, not the
    program (the pre-r4 42k number was ~94% tunnel).  A 64-iteration
    lax.scan amortizes the dispatch cost the way bench_extract does;
    the single-element carry update blocks loop-invariant hoisting
    without the full-buffer carry copy."""
    from xvector_tpu.ops import features as F
    b, s = 16, 8 * 8000       # 16 × 8 s utterances
    rng = np.random.RandomState(0)
    waves = jnp.asarray((rng.randn(b, s) * 2000).astype(np.float32))
    lens = jnp.full((b,), s, jnp.int32)
    cfg = F.MfccConfig(dither=0.0)
    n_inner, calls = 64, 4

    @jax.jit
    def run(w, n):
        def body(c, _):
            feats, mask = F.mfcc_batch(c, n, cfg)
            vad = F.energy_vad_batch(feats, mask)
            out = feats[0, 0, 0] + vad[0, 0]
            return c.at[0, 0].add(1e-6 * out), out
        _, outs = jax.lax.scan(body, w, None, length=n_inner)
        return outs

    np.asarray(run(waves, lens))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(waves, lens)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / (calls * n_inner))
    return b * (s / 8000) / best


def bench_extract_wave(jax, jnp):
    """Wave→x-vector (the --from-wav one-dispatch pipeline):
    embeddings/s over 8 s utterances, steady state."""
    from xvector_tpu.extract.extractor import (WaveExtractor,
                                               WaveExtractorConfig)
    from xvector_tpu.models import tdnn
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg, 512)
    wex = WaveExtractor(model_cfg, params, state,
                        WaveExtractorConfig(batch_size=32))
    rng = np.random.RandomState(0)
    n_utt, dur_s = 96, 8
    utts = [(f"u{i}", (rng.randn(dur_s * 8000) * 2000).astype(np.float32))
            for i in range(n_utt)]
    _ = wex.extract(iter(utts))          # warmup (compiles one bucket)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = wex.extract(iter(utts))
        best = min(best, time.perf_counter() - t0)
    assert len(out) == n_utt
    return n_utt / best, n_utt * dur_s / best


def bench_extract_wave_device(jax, jnp):
    """Device-resident wave→x-vector: the fused MFCC+VAD+CMVN+compaction+
    TDNN program alone, waveforms pre-staged on device — separates
    regressions of the compiled program from the tunnel transport ceiling
    that bounds ``bench_extract_wave`` (~55 MB/s host link).

    Methodology (fixed round 5, VERDICT r4 weak #1): the per-dispatch
    variant of this bench ran 16 pipelined dispatches and reported
    ~3.9 ms/call — exactly this tunnel's ~4 ms dispatch floor, so its
    number swung with tunnel day, not the program.  The headline number
    now scan-amortizes 64 program iterations per dispatch (the same fix
    bench_features got in round 4), with a single-element carry update to
    block loop-invariant hoisting.  Both numbers are returned — the
    per-dispatch one stays in the JSON as the in-session A/B that shows
    what fraction of it is wire."""
    from xvector_tpu.extract.extractor import (WaveExtractor,
                                               WaveExtractorConfig,
                                               pack_wave_batch)
    from xvector_tpu.models import tdnn
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg, 512)
    wex = WaveExtractor(model_cfg, params, state,
                        WaveExtractorConfig(batch_size=32))
    b, dur_s, sr = 32, 8, 8000
    rng = np.random.RandomState(0)
    items = [(f"u{i}", (rng.randn(dur_s * sr) * 2000).astype(np.float32))
             for i in range(b)]
    waves, lens = pack_wave_batch(items, dur_s * sr, b)
    waves_d, lens_d = jnp.asarray(waves), jnp.asarray(lens)

    n_inner, calls = 64, 4

    @jax.jit
    def run(w, n):
        def body(c, _):
            xv, _ = wex._fn(params, state, c, n, None)
            out = xv[0, 0]
            return c.at[0, 0].add(1e-6 * out), out
        _, outs = jax.lax.scan(body, w, None, length=n_inner)
        return outs

    np.asarray(run(waves_d, lens_d))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(waves_d, lens_d)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / (calls * n_inner))
    device_rate = b / best

    # in-session A/B: the old dispatch-bound measurement
    xv, _ = wex._fn(params, state, waves_d, lens_d, None)
    np.asarray(xv)
    per_dispatch = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(16):
            xv, _ = wex._fn(params, state, waves_d, lens_d, None)
        np.asarray(xv)
        per_dispatch = min(per_dispatch, (time.perf_counter() - t0) / 16)
    return device_rate, b / per_dispatch


def bench_tunnel_calibration(jax, jnp):
    """Transport characteristics of THIS session, recorded alongside the
    throughput rows so wave/extract numbers are interpretable across
    rounds (VERDICT r4 weak #1: wire-bound rows swing with tunnel day and
    are not comparable without the wire's own numbers):

    * dispatch_ms — per-call cost of a no-op jitted fn, 64 pipelined
      calls per host sync (the queue-throughput dispatch floor);
    * roundtrip_ms — one dispatch + host readback (latency);
    * upload_MB_s — host→device bandwidth via a 16 MB device_put feeding
      a device reduce, roundtrip subtracted."""
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    K = 64
    disp = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(K):
            y = f(y)
        np.asarray(y)
        disp = min(disp, (time.perf_counter() - t0) / K)
    rt = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rt = min(rt, time.perf_counter() - t0)
    mb = 16
    buf = np.random.RandomState(0).randn(mb * 262144).astype(np.float32)
    red = jax.jit(jnp.sum)
    np.asarray(red(jnp.asarray(buf)))
    up = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(red(jax.device_put(buf)))
        up = min(up, time.perf_counter() - t0)
    return {"tunnel_dispatch_ms": round(disp * 1e3, 3),
            "tunnel_roundtrip_ms": round(rt * 1e3, 3),
            "tunnel_upload_MB_s": round(mb / max(up - rt, 1e-9), 1)}


def bench_extract(jax, jnp):
    """Batched extraction forward: N batches per dispatch (scan) AND
    several pipelined dispatches per host sync.  Each dispatch costs
    ~24 ms of tunnel latency on this transport (measured by sweeping
    calls-per-sync with a fixed compiled fn), so a single-dispatch
    measurement under-reports device throughput ~2.5x; amortizing over
    n*calls iterations recovers the true rate."""
    from xvector_tpu.models import tdnn
    model_cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg, 512)

    b, t, n, calls = 32, 1024, 10, 8   # ~10 s utterances, batched
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, FEAT_DIM).astype(np.float32))
    mask = jnp.ones((b, t), jnp.float32)

    @jax.jit
    def fwd_n(x):
        def body(c, _):
            xv = tdnn.extract_xvector(model_cfg, params, state, c, mask,
                                      compute_dtype=jnp.bfloat16)
            return c + 1e-6 * xv[:, None, :FEAT_DIM], xv[0, 0]
        c, outs = jax.lax.scan(body, x, None, length=n)
        return outs

    np.asarray(fwd_n(x))     # warmup, forced sync
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fwd_n(x)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / (n * calls))
    return b / best


def main():
    import jax
    import jax.numpy as jnp
    from xvector_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    device = str(jax.devices()[0])
    train_tp, step_ms = bench_train(jax, jnp)
    extract_tp = bench_extract(jax, jnp)
    variants = bench_variants(jax, jnp)
    feat_tp = bench_features(jax, jnp)
    wave_emb_s, wave_audio_s = bench_extract_wave(jax, jnp)
    wave_dev_emb_s, wave_dev_dispatch = bench_extract_wave_device(jax, jnp)
    tunnel = bench_tunnel_calibration(jax, jnp)

    if os.path.exists(BASELINE_FILE):
        baseline = json.load(open(BASELINE_FILE))["value"]
    else:
        baseline = train_tp
        with open(BASELINE_FILE, "w") as f:
            json.dump({"value": train_tp, "device": device,
                       "note": "first recorded run (reference repo "
                               "publishes no throughput numbers)"}, f)

    print(json.dumps({
        "metric": "train_audio_seconds_per_second_per_chip",
        "value": round(train_tp, 1),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(train_tp / baseline, 3),
        "step_ms": round(step_ms, 2),
        "extract_embeddings_per_s": round(extract_tp, 1),
        "extract_from_wav_embeddings_per_s": round(wave_emb_s, 1),
        "extract_from_wav_audio_s_per_s": round(wave_audio_s, 1),
        "extract_from_wav_device_embeddings_per_s": round(wave_dev_emb_s,
                                                          1),
        "extract_from_wav_dispatch_bound_embeddings_per_s": round(
            wave_dev_dispatch, 1),
        "features_audio_s_per_s": round(feat_tp, 1),
        **variants,
        **tunnel,
        "device": device,
    }))


if __name__ == "__main__":
    main()
