"""Batched x-vector extraction with chunk-and-average semantics.

Replaces the reference's per-utterance, batch-size-1 extraction loop
(``models.py:356-432`` + ``extract_embedding.py`` + ``extract_xvectors.sh``)
with a TPU-shaped pipeline:

* each utterance is split into consecutive chunks of ≤ ``max_chunk`` frames;
  a trailing chunk shorter than ``min_chunk`` is dropped; the utterance
  x-vector is the frame-count-weighted average of its chunks' embeddings —
  exactly the reference protocol (``models.py:396-421``,
  ``run_xvector.sh:65-75``);
* chunks are padded to a small set of bucket lengths and batched
  ``batch_size`` at a time per bucket, so XLA compiles one program per
  (bucket, batch) shape instead of one per utterance length, and the MXU
  sees large batches;
* feature preprocessing (sliding CMVN + VAD selection,
  ``extract_xvectors.sh:68``) is available via :func:`preprocess`.

Output is ready for :class:`xvector_tpu.io.kaldi_ark.ArkWriter`, feeding an
unchanged external PLDA back-end, or the native one in
``xvector_tpu.backend``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tdnn
from ..ops import features as F

__all__ = ["ExtractorConfig", "XvectorExtractor", "preprocess",
           "speaker_means", "make_wave_to_xvector", "WaveExtractor",
           "WaveExtractorConfig", "read_wav_scp", "pack_wave_batch"]


@dataclass(frozen=True)
class ExtractorConfig:
    min_chunk: int = 25        # run_xvector.sh:75
    max_chunk: int = 10000     # run_xvector.sh:70
    # 32 per the round-5 chip sweep (docs/extract_sweep_r05.json):
    # b=16 -> 32 is +15% device audio-throughput at the 1024-frame
    # bucket (156.8k -> 180.4k audio_s/s; b=64 adds only +1.8% more);
    # tail partial batches dispatch at actual size, so small jobs pay
    # nothing for the larger default.
    batch_size: int = 32
    # bucket boundaries: pad each chunk up to the next bucket; geometric-ish
    # spacing bounds padding waste at ~2x worst case, ~25% typical
    buckets: Tuple[int, ...] = (32, 64, 128, 192, 256, 384, 512, 768, 1024,
                                1536, 2048, 3072, 4096, 6144, 8192, 10016)
    # library default stays f32 for exact CPU-reference parity in tests;
    # the CLIs pass bfloat16 (the TPU production setting: 2x MXU rate,
    # and f32 matmuls run as bf16 passes on TPU anyway)
    compute_dtype: str = "float32"
    # full batches of one bucket shape scanned per device dispatch.
    # >1 batches the per-dispatch sync at the cost of delaying results and
    # an extra compilation per depth; measured on the tunnel-attached chip
    # the host→device upload dominates either way, so the default stays 1.
    dispatch_depth: int = 1
    # fused Pallas frame-level stack (ops/tdnn_kernel.py): all five conv
    # layers in one kernel, intermediates VMEM-resident.  Opt-in: measured
    # on v5e the XLA shifted-dot-general path is ~10% faster at extraction
    # shapes (XLA already fuses the epilogues; the kernel's f32 VMEM
    # intermediates cap its tile size), so the default stays False.
    use_fused: bool = False


def preprocess(feats: np.ndarray, cmvn_window: int = 300,
               vad: Optional[np.ndarray] = None) -> np.ndarray:
    """Sliding CMVN then voiced-frame selection (the reference's feature
    pipe ``apply-cmvn-sliding … | select-voiced-frames``)."""
    out = np.asarray(F.sliding_cmvn(jnp.asarray(feats), window=cmvn_window))
    if vad is not None:
        out = out[np.asarray(vad) > 0.5]
    return out


class XvectorExtractor:
    def __init__(self, model_cfg: tdnn.TdnnConfig, params, state,
                 cfg: ExtractorConfig = ExtractorConfig()):
        self.model_cfg = model_cfg
        self.params = params
        self.state = state
        self.cfg = cfg
        self._fused = cfg.use_fused
        if self._fused:
            from ..ops import tdnn_kernel
            if not tdnn_kernel.supports(model_cfg):
                raise ValueError("fused extraction unsupported for "
                                 f"topology {model_cfg.name}")
        self._fwd = jax.jit(self._forward, static_argnames=())
        self._fwd_scan = jax.jit(self._forward_scan)

    def _forward(self, x, mask):
        if self._fused:
            from ..ops.tdnn_kernel import fused_frame_stack
            h = fused_frame_stack(self.model_cfg, self.params, self.state,
                                  x, mask)
            pooled = tdnn.stats_pooling(h, mask.astype(jnp.float32)[..., None])
            e0 = self.params["embed"][0]
            cd = jnp.dtype(self.cfg.compute_dtype)
            return (jnp.dot(pooled.astype(cd), e0["w"].astype(cd),
                            preferred_element_type=jnp.float32)
                    + e0["b"]).astype(jnp.float32)
        return tdnn.extract_xvector(
            self.model_cfg, self.params, self.state, x, mask=mask,
            compute_dtype=jnp.dtype(self.cfg.compute_dtype))

    def _forward_scan(self, xs, masks):
        """(D, B, T, F) stacked batches → (D, B, E) in one dispatch."""
        def body(c, inp):
            x, m = inp
            return c, self._forward(x, m)
        _, out = jax.lax.scan(body, 0, (xs, masks))
        return out

    # -- chunking ---------------------------------------------------------
    def _chunks(self, num_rows: int) -> List[Tuple[int, int]]:
        """(offset, length) chunk list per the reference protocol:
        ceil(rows/max_chunk) consecutive chunks, drop short tail."""
        c = self.cfg
        if num_rows <= c.max_chunk:
            return [(0, num_rows)] if num_rows >= c.min_chunk else []
        out = []
        for off in range(0, num_rows, c.max_chunk):
            ln = min(c.max_chunk, num_rows - off)
            if ln >= c.min_chunk:
                out.append((off, ln))
        return out

    def _bucket(self, length: int) -> int:
        for b in self.cfg.buckets:
            if length <= b:
                return b
        return self.cfg.buckets[-1]

    # -- batched streaming extraction -------------------------------------
    def extract_iter(self, stream: Iterable[Tuple[str, np.ndarray]]
                     ) -> Iterator[Tuple[str, np.ndarray]]:
        """Consume (utt, feats (T, F)) pairs; yield (utt, xvector) in
        completion order.  Batches chunks across utterances per length
        bucket; utterances shorter than min_chunk are skipped (reference
        behaviour models.py:405-407 logs & skips)."""
        feat_dim = self.model_cfg.feat_dim
        pend_sum: Dict[str, np.ndarray] = {}
        pend_weight: Dict[str, float] = {}
        pend_left: Dict[str, int] = {}
        order: List[str] = []
        buckets: Dict[int, List[Tuple[str, np.ndarray, int]]] = {}
        # full (x, mask, items) batches awaiting a scan dispatch, per bucket
        staged: Dict[int, List] = {}

        def credit(items, xv):
            for i, (utt, _, ln) in enumerate(items):
                pend_sum[utt] = pend_sum.get(utt, 0.0) + ln * xv[i]
                pend_weight[utt] = pend_weight.get(utt, 0.0) + ln
                pend_left[utt] -= 1

        def pack(b: int, items):
            n = len(items)
            x = np.zeros((n, b, feat_dim), np.float32)
            mask = np.zeros((n, b), np.float32)
            for i, (_, rows, ln) in enumerate(items):
                x[i, :ln] = rows
                mask[i, :ln] = 1.0
            return x, mask

        def dispatch_staged(b: int):
            batches = staged.pop(b, [])
            if not batches:
                return
            if len(batches) == 1:
                x, mask, items = batches[0]
                credit(items, np.asarray(
                    self._fwd(jnp.asarray(x), jnp.asarray(mask))))
                return
            xs = np.stack([bb[0] for bb in batches])
            masks = np.stack([bb[1] for bb in batches])
            xvs = np.asarray(self._fwd_scan(jnp.asarray(xs),
                                            jnp.asarray(masks)))
            for d, (_, _, items) in enumerate(batches):
                credit(items, xvs[d])

        def run_bucket(b: int, final: bool = False):
            items = buckets.pop(b, [])
            if items:
                if not final and len(items) >= self.cfg.batch_size:
                    # full batch → stage for a scanned multi-batch dispatch
                    x, mask = pack(b, items)
                    staged.setdefault(b, []).append((x, mask, items))
                    if len(staged[b]) >= self.cfg.dispatch_depth:
                        dispatch_staged(b)
                    return
                x, mask = pack(b, items)
                credit(items, np.asarray(
                    self._fwd(jnp.asarray(x), jnp.asarray(mask))))
            if final:
                dispatch_staged(b)

        def drain_complete():
            while order and pend_left.get(order[0], 1) == 0:
                utt = order.pop(0)
                del pend_left[utt]
                yield utt, (pend_sum.pop(utt)
                            / pend_weight.pop(utt)).astype(np.float32)

        for utt, feats in stream:
            feats = np.asarray(feats, np.float32)
            chunks = self._chunks(feats.shape[0])
            if not chunks:
                continue
            order.append(utt)
            pend_left[utt] = len(chunks)
            for off, ln in chunks:
                b = self._bucket(ln)
                buckets.setdefault(b, []).append(
                    (utt, feats[off: off + ln], ln))
                if len(buckets[b]) >= self.cfg.batch_size:
                    run_bucket(b)
                    yield from drain_complete()
        for b in sorted(set(buckets) | set(staged)):
            run_bucket(b, final=True)
        yield from drain_complete()

    def extract(self, stream: Iterable[Tuple[str, np.ndarray]]
                ) -> Dict[str, np.ndarray]:
        return dict(self.extract_iter(stream))


def pack_wave_batch(items, bucket_len: int, n_rows: int):
    """Zero-pad (utt, wave) items into an int16 (n_rows, bucket_len)
    batch + per-row sample counts — the ONE place that fixes the
    quantisation (rint+clip, i.e. exactly a 16-bit wav write) and the
    int16 wire format (host→device bandwidth is the wave paths' binding
    constraint).  Shared by WaveExtractor and the recipe feature stage."""
    waves = np.zeros((n_rows, bucket_len), np.int16)
    lens = np.zeros(n_rows, np.int32)
    for i, (_, w) in enumerate(items):
        waves[i, : len(w)] = np.clip(np.rint(w), -32768, 32767)
        lens[i] = len(w)
    return waves, lens


@dataclass(frozen=True)
class WaveExtractorConfig:
    """Config for :class:`WaveExtractor` (the ``--from-wav`` mode)."""
    min_chunk: int = 25        # run_xvector.sh:75 (voiced frames)
    max_chunk: int = 10000     # run_xvector.sh:70 (frames = 100 s @ 8 kHz)
    batch_size: int = 16
    cmvn_window: int = 300
    dither_seed: int = 0       # 0 disables dither (deterministic extract)
    compute_dtype: str = "bfloat16"
    # waveform-length buckets in seconds; each bucket compiles one XLA
    # program over the whole mfcc→vad→cmvn→tdnn chain
    bucket_seconds: Tuple[float, ...] = (
        1, 2, 3, 5, 8, 12, 20, 30, 45, 60, 80, 100)


class WaveExtractor:
    """Production wave → x-vector extraction: batches raw waveforms
    through the one-dispatch :func:`make_wave_to_xvector` pipeline.

    This collapses the reference's entire extraction chain — per-utterance
    `compute-mfcc-feats | compute-vad-energy | apply-cmvn-sliding |
    select-voiced-frames` pipes (run.sh:97-101, extract_xvectors.sh:68)
    plus the TF forward — into one jitted XLA program per length bucket.

    Utterances longer than ``max_chunk`` frames take a two-stage path:
    features + preprocessing on host (identical ops), then the feature
    extractor's chunk-and-average protocol — matching the reference,
    whose CMVN/VAD run over the FULL utterance before chunking
    (models.py:396-421).
    """

    def __init__(self, model_cfg: tdnn.TdnnConfig, params, state,
                 cfg: WaveExtractorConfig = WaveExtractorConfig(),
                 mfcc_cfg: F.MfccConfig = F.MfccConfig(),
                 vad_cfg: F.VadConfig = F.VadConfig()):
        self.cfg = cfg
        self.mfcc_cfg = mfcc_cfg
        self.vad_cfg = vad_cfg
        if cfg.dither_seed == 0:
            import dataclasses
            mfcc_cfg = dataclasses.replace(mfcc_cfg, dither=0.0)
            self.mfcc_cfg = mfcc_cfg
        self._fn = make_wave_to_xvector(
            model_cfg, mfcc_cfg, vad_cfg, cmvn_window=cfg.cmvn_window,
            compute_dtype=jnp.dtype(cfg.compute_dtype))
        self.params = params
        self.state = state
        self._key = (jax.random.PRNGKey(cfg.dither_seed)
                     if cfg.dither_seed else None)
        # feature-path extractor for > max_chunk utterances
        self._long = XvectorExtractor(
            model_cfg, params, state,
            ExtractorConfig(min_chunk=cfg.min_chunk,
                            max_chunk=cfg.max_chunk,
                            batch_size=max(1, cfg.batch_size // 4),
                            compute_dtype=cfg.compute_dtype))
        sr = mfcc_cfg.sample_rate
        self._buckets = tuple(int(s * sr) for s in cfg.bucket_seconds)
        # sample count beyond which the utterance exceeds max_chunk frames
        self._long_samples = cfg.max_chunk * mfcc_cfg.frame_shift

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def extract_iter(self, stream: Iterable[Tuple[str, np.ndarray]]
                     ) -> Iterator[Tuple[str, np.ndarray]]:
        """Consume (utt, wave float32 int16-scale) pairs; yield
        (utt, xvector).  Utterances with < min_chunk voiced frames are
        skipped (the reference logs & skips, models.py:405-407)."""
        import concurrent.futures as cf

        buckets: Dict[int, List[Tuple[str, np.ndarray]]] = {}
        # Host→device bandwidth is the binding constraint of this path on
        # tunnel-attached chips (device compute: ~6 ms for 32×8 s; f32
        # upload of the same batch: ~150 ms).  Waves are int16-scale, so
        # ship them as int16 (half the bytes; cast on device is free) and
        # run uploads on a background thread so batch k+1's transfer
        # overlaps batch k's compute.  Results are also left on device
        # until 2 batches later to avoid per-batch sync round-trips.
        uploader = cf.ThreadPoolExecutor(max_workers=1)
        inflight: List[Tuple[List, Any, Any]] = []

        def materialize(entry):
            items, xv_dev, voiced_dev = entry
            xv, voiced = np.asarray(xv_dev), np.asarray(voiced_dev)
            for i, (utt, _) in enumerate(items):
                if voiced[i] >= self.cfg.min_chunk:
                    yield utt, xv[i].astype(np.float32)

        def upload(items, b):
            # pad the batch dim to batch_size so ragged tails reuse the
            # same compiled program (one compile per bucket, not per
            # (tail, bucket) pair); padded rows have n_samples=0 and are
            # dropped by the voiced-count filter
            waves, lens = pack_wave_batch(
                items, b, max(len(items), self.cfg.batch_size))
            return jnp.asarray(waves), jnp.asarray(lens)

        upload_q: List[Tuple[List, Any]] = []   # (items, upload future)

        def dispatch_oldest():
            items, fut = upload_q.pop(0)
            if self._key is not None:
                self._key, sub = jax.random.split(self._key)
            else:
                sub = None
            waves_d, lens_d = fut.result()
            xv, voiced = self._fn(self.params, self.state, waves_d,
                                  lens_d, sub)
            inflight.append((items, xv, voiced))
            while len(inflight) > 2:
                yield from materialize(inflight.pop(0))

        def run_bucket(b: int):
            items = buckets.pop(b, [])
            if not items:
                return
            upload_q.append((items, uploader.submit(upload, items, b)))
            while len(upload_q) > 1:      # overlap next upload w/ compute
                yield from dispatch_oldest()

        def long_path(utt, wave):
            if self._key is not None:
                self._key, sub = jax.random.split(self._key)
            else:
                sub = None
            feats = np.asarray(F.mfcc(jnp.asarray(wave), self.mfcc_cfg,
                                      key=sub))
            vad = np.asarray(F.energy_vad(jnp.asarray(feats),
                                          self.vad_cfg))
            feats = preprocess(feats, cmvn_window=self.cfg.cmvn_window,
                               vad=vad)
            yield from self._long.extract_iter([(utt, feats)])

        try:
            for utt, wave in stream:
                wave = np.asarray(wave, np.float32).reshape(-1)
                if len(wave) > self._long_samples:
                    yield from long_path(utt, wave)
                    continue
                b = self._bucket(len(wave))
                buckets.setdefault(b, []).append((utt, wave))
                if len(buckets[b]) >= self.cfg.batch_size:
                    yield from run_bucket(b)
            for b in sorted(buckets):
                yield from run_bucket(b)
            while upload_q:
                yield from dispatch_oldest()
            while inflight:
                yield from materialize(inflight.pop(0))
        finally:
            # also on consumer abandonment / dispatch exceptions: don't
            # leak the worker thread and its queued device buffers
            uploader.shutdown(wait=False, cancel_futures=True)

    def extract(self, stream) -> Dict[str, np.ndarray]:
        return dict(self.extract_iter(stream))


def read_wav_scp(path: str, target_sr: Optional[int] = 8000
                 ) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (utt, wave) pairs from a Kaldi wav.scp (plain paths,
    ``path#chN`` channel specs — incl. embedded-shorten SPHERE via the
    native decoder — or ``cmd |`` pipes).

    ``target_sr``: entries at a different stored rate are resampled
    (band-limited polyphase) so the feature front-end's configured rate
    is always honoured; pass None to forward samples as stored."""
    from ..io import wav as wavlib
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) != 2:
                continue
            utt, spec = parts
            samples, rate = wavlib.load_wave(spec)
            if target_sr and rate and rate != target_sr:
                samples = wavlib.resample(samples, rate, target_sr)
            yield utt, samples


def make_wave_to_xvector(model_cfg: tdnn.TdnnConfig,
                         mfcc_cfg: F.MfccConfig = F.MfccConfig(),
                         vad_cfg: F.VadConfig = F.VadConfig(),
                         cmvn_window: int = 300,
                         compute_dtype=jnp.bfloat16):
    """One-dispatch waveform → x-vector pipeline.

    The reference needs four Kaldi C++ binaries chained through Unix pipes
    per utterance plus a separate TF forward (``run.sh:97-101``,
    ``extract_xvectors.sh:68``, ``models.py:356-432``); here the whole
    chain — dithered MFCC, energy VAD, sliding CMVN, voiced-frame
    compaction, TDNN forward, embedding readout — is a single jitted XLA
    program over a padded ``(B, S)`` waveform batch.

    Returns ``fn(params, state, waves, n_samples, key) -> (xvectors (B, D),
    voiced_frames (B,))``.  ``voiced_frames`` lets the caller apply the
    recipe's min-chunk policy (drop utterances with < 25 voiced frames,
    ``run_xvector.sh:75``); rows with ``voiced_frames == 0`` come back as
    NaN so an all-silence utterance cannot be mistaken for a valid
    embedding.  Utterances longer than ``max_chunk`` frames
    should be split and weight-averaged by the caller exactly as
    :class:`XvectorExtractor` does for feature input.
    """

    @jax.jit
    def fn(params, state, waves, n_samples, key=None):
        feats, fmask = F.mfcc_batch(waves, n_samples, mfcc_cfg, key)
        vad = F.energy_vad_batch(feats, fmask, vad_cfg)
        feats = F.sliding_cmvn_batch(feats, fmask, window=cmvn_window)
        feats, vmask = F.compact_voiced(feats, vad)
        xv = tdnn.extract_xvector(model_cfg, params, state, feats, vmask,
                                  compute_dtype=compute_dtype)
        voiced = jnp.sum(vmask, axis=1).astype(jnp.int32)
        # an all-silence row has no meaningful embedding — poison it with
        # NaN so downstream consumers can't silently use it
        xv = jnp.where((voiced > 0)[:, None], xv, jnp.nan)
        return xv, voiced

    return fn


def speaker_means(xvectors: Dict[str, np.ndarray],
                  utt2spk: Dict[str, str]
                  ) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    """Per-speaker mean x-vectors + utterance counts (``ivector-mean``
    spk2utt path, ``extract_xvectors.sh:100-102``)."""
    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}
    for utt, v in xvectors.items():
        spk = utt2spk[utt]
        sums[spk] = sums.get(spk, 0.0) + v
        counts[spk] = counts.get(spk, 0) + 1
    return {s: (sums[s] / counts[s]).astype(np.float32)
            for s in sums}, counts
