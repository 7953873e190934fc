"""On-device data augmentation: RIR reverberation + additive noise mixing.

TPU-native replacement for the reference's augmentation stage, which shells
out to Kaldi's ``wav-reverberate`` through ``reverberate_data_dir.py``
(RIR convolution, ``run.sh:124-142``) and ``augment_data_dir.py`` (MUSAN
noise/music/babble at fixed SNR sets, ``run.sh:155-163``).

Key kernel: :func:`fir_conv` — long FIR convolution as a **blocked-Toeplitz
matmul**.  ``jnp.fft`` is unimplemented on this TPU backend and a direct
time-domain conv is VPU-bound, so each output block of B samples is an
(B+K-1)-tap window times a (B+K-1, B) banded matrix built from the impulse
response — all FLOPs land on the MXU, and the matrix is rebuilt per RIR by
a gather (so RIRs can be traced values).

SNR semantics follow ``wav-reverberate --snrs``: noise is scaled so that
10·log10(P_signal / P_noise_scaled) equals the requested SNR, with the
reference recipe's SNR grammars (noise ``--fg-snrs 10:5``, music
``--bg-snrs 10:7:5``, babble ``--bg-snrs 19:17:15:13`` with
``--num-bg-noises 3:4:5:6:7`` — run.sh:156-163).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fir_conv", "reverberate", "mix_noise", "AugmentConfig",
           "NOISE_SNRS", "MUSIC_SNRS", "BABBLE_SNRS"]

NOISE_SNRS = (10.0, 5.0)                # run.sh:156 --fg-snrs "10:5"
MUSIC_SNRS = (10.0, 7.0, 5.0)           # run.sh:159 --bg-snrs "10:7:5"
BABBLE_SNRS = (19.0, 17.0, 15.0, 13.0)  # run.sh:162 --bg-snrs "19:17:15:13"


@functools.lru_cache(maxsize=8)
def _toeplitz_gather(block: int, k: int) -> np.ndarray:
    """(block+k-1, block) gather indices into a length-k impulse response:
    W[i, b] = h[b + k - 1 - i], out-of-range → index k (a zero slot)."""
    i = np.arange(block + k - 1)[:, None]
    b = np.arange(block)[None, :]
    idx = b + k - 1 - i
    return np.where((idx >= 0) & (idx < k), idx, k).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("block",))
def _fir_conv_padded(xp: jnp.ndarray, h: jnp.ndarray,
                     block: int) -> jnp.ndarray:
    """xp: pre-padded signal of length n_blocks*block + k - 1 (k-1 leading
    zeros); returns n_blocks*block convolution outputs."""
    k = h.shape[0]
    idx = jnp.asarray(_toeplitz_gather(block, k))
    w = jnp.concatenate([h, jnp.zeros(1, h.dtype)])[idx]   # (B+K-1, B)
    n_blocks = (xp.shape[0] - (k - 1)) // block
    starts = jnp.arange(n_blocks) * block
    frames = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(xp, s, block + k - 1))(starts)
    out = jnp.dot(frames, w, preferred_element_type=jnp.float32)
    return out.reshape(-1)


def fir_conv(x: jnp.ndarray, h: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """y[n] = Σ_k h[k]·x[n-k] for n in [0, len(x)) — "same-start" FIR
    filtering (what wav-reverberate applies, output trimmed to input
    length)."""
    x = jnp.asarray(x, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    n = x.shape[0]
    k = h.shape[0]
    n_blocks = -(-n // block)
    pad_right = n_blocks * block - n
    xp = jnp.pad(x, (k - 1, pad_right))
    return _fir_conv_padded(xp, h, block)[:n]


def _power(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x)) + 1e-20


def reverberate(x: jnp.ndarray, rir: jnp.ndarray,
                normalize_power: bool = True) -> jnp.ndarray:
    """Convolve with a room impulse response; rescale so output power
    matches input power (wav-reverberate --volume behaviour used by
    reverberate_data_dir.py)."""
    y = fir_conv(x, rir)
    if normalize_power:
        y = y * jnp.sqrt(_power(x) / _power(y))
    return y


def _fit_length(noise: jnp.ndarray, n: int, offset: int = 0) -> jnp.ndarray:
    """Crop/tile a noise signal to exactly n samples starting at offset."""
    reps = -(-(n + offset) // noise.shape[0])
    tiled = jnp.tile(noise, reps)
    return jax.lax.dynamic_slice_in_dim(tiled, offset, n)


def mix_noise(x: jnp.ndarray, noise: jnp.ndarray, snr_db: float,
              offset: int = 0) -> jnp.ndarray:
    """Add noise at the given SNR (dB), tiling/cropping the noise to cover
    the whole signal (augment_data_dir.py background-noise semantics)."""
    x = jnp.asarray(x, jnp.float32)
    noise = _fit_length(jnp.asarray(noise, jnp.float32), x.shape[0], offset)
    scale = jnp.sqrt(_power(x) / _power(noise)
                     / (10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)))
    return x + scale * noise


@dataclass(frozen=True)
class AugmentConfig:
    """One augmented copy per clean utterance per kind, reference-style:
    the recipe builds full-size reverb/noise/music/babble copies and
    combines all of them with the clean list (run.sh:124-171 — no
    subsetting in this recipe, unlike upstream sre16/v2). RIR sampling is
    uniform over the provided list; pass equally-sized small+medium room
    lists to reproduce the 0.5/0.5 ``--rir-set-parameters`` split
    (run.sh:126-127)."""
    noise_snrs: Tuple[float, ...] = NOISE_SNRS
    music_snrs: Tuple[float, ...] = MUSIC_SNRS
    babble_snrs: Tuple[float, ...] = BABBLE_SNRS
    babble_speakers: Tuple[int, int] = (3, 7)   # augment_data_dir defaults


def augment_utterance(kind: str, x: np.ndarray, rng: np.random.RandomState,
                      cfg: AugmentConfig,
                      rirs: Optional[Union[Sequence[np.ndarray],
                                           Mapping[str, Sequence[np.ndarray]]
                                           ]] = None,
                      noises: Optional[Sequence[np.ndarray]] = None,
                      musics: Optional[Sequence[np.ndarray]] = None,
                      speeches: Optional[Sequence[np.ndarray]] = None
                      ) -> np.ndarray:
    """Produce one augmented copy. ``kind`` ∈ reverb|noise|music|babble.
    Host-side sampling (choice of RIR/noise/SNR) + device-side math.

    ``rirs`` may be a mapping ``room_type → list of RIRs`` — the room type
    is then sampled uniformly first, reproducing the reference's equal
    ``--rir-set-parameters "0.5, …smallroom…"/"0.5, …mediumroom…"`` split
    regardless of list sizes (run.sh:126-127)."""
    if kind == "reverb":
        if isinstance(rirs, Mapping):
            room = sorted(rirs)[rng.randint(len(rirs))]
            rirs = rirs[room]
        rir = rirs[rng.randint(len(rirs))]
        return np.asarray(reverberate(x, rir))
    if kind == "noise":
        snr = cfg.noise_snrs[rng.randint(len(cfg.noise_snrs))]
        noise = noises[rng.randint(len(noises))]
        return np.asarray(mix_noise(x, noise, snr,
                                    offset=int(rng.randint(
                                        max(len(noise), 1)))))
    if kind == "music":
        snr = cfg.music_snrs[rng.randint(len(cfg.music_snrs))]
        music = musics[rng.randint(len(musics))]
        return np.asarray(mix_noise(x, music, snr))
    if kind == "babble":
        snr = cfg.babble_snrs[rng.randint(len(cfg.babble_snrs))]
        lo, hi = cfg.babble_speakers
        n_spk = rng.randint(lo, hi + 1)
        picks = [speeches[rng.randint(len(speeches))] for _ in range(n_spk)]
        m = max(len(p) for p in picks)
        babble = np.zeros(m, np.float32)
        for p in picks:
            babble[: len(p)] += np.asarray(p, np.float32)
        return np.asarray(mix_noise(x, babble, snr))
    raise ValueError(f"unknown augmentation kind {kind!r}")
