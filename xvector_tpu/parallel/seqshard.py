"""Sequence-parallel x-vector extraction for long utterances.

The reference bounds sequence length by chunking any utterance to ≤10000
frames and weight-averaging chunk x-vectors (``models.py:396-421``) — an
approximation.  On a TPU mesh the exact computation is cheap to
distribute (SURVEY §5): the frame-level layers are local convolutions
(receptive field 15), and stats pooling is a sum-decomposable reduction, so

  * the time axis is sharded over the ``data`` axis of the mesh;
  * each shard runs the conv stack on its slice plus a ``halo`` of
    neighbour frames exchanged via ``lax.ppermute`` (7 frames each side
    for every stock topology);
  * pooling moments are psum'd across shards — bit-comparable to the
    single-device computation over the full sequence;
  * the attention-pooling topology (``models.py:1039-1051``) runs its
    time-axis softmax ONLINE across shards (pmax for the global max,
    psum'd exp-sums and weighted moments) — the blockwise-softmax case
    SURVEY §5 calls out for long sequences.

This yields the TRUE x-vector of arbitrarily long utterances (memory per
chip stays O(T / n_shards)) instead of the reference's chunk-and-average.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import tdnn

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["seq_sharded_xvector"]


def _halo_exchange(x, halo: int, axis: str):
    """Append each shard's neighbour frames: returns (halo + t + halo, C)
    with zeros at the global sequence boundary."""
    n = jax.lax.axis_size(axis)
    right_of = [(i, (i + 1) % n) for i in range(n)]
    left_of = [(i, (i - 1) % n) for i in range(n)]
    # what I receive from my LEFT neighbour = its last `halo` frames
    from_left = jax.lax.ppermute(x[-halo:], axis, right_of)
    from_right = jax.lax.ppermute(x[:halo], axis, left_of)
    idx = jax.lax.axis_index(axis)
    from_left = jnp.where(idx == 0, 0.0, from_left)       # global edge
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def seq_sharded_xvector(cfg: tdnn.TdnnConfig, params, state, x,
                        mesh, valid_len: Optional[int] = None,
                        axis: str = "data") -> jnp.ndarray:
    """Exact x-vector of one long utterance, time-sharded over the mesh.

    x: (T, feat_dim) with T divisible by the axis size (pad with zeros and
    pass ``valid_len``).  Returns (xvector_dim,) f32.
    """
    if cfg.pooling not in ("stats", "attention"):
        raise ValueError(f"unknown pooling {cfg.pooling!r}")
    halo = sum((k - 1) // 2 * d
               for k, d in zip(cfg.kernel_sizes, cfg.dilations))
    t_total = x.shape[0]
    n = mesh.shape[axis]
    if t_total % n:
        raise ValueError(f"sequence length {t_total} not divisible by "
                         f"{axis}={n}; pad and pass valid_len")
    valid = t_total if valid_len is None else valid_len

    def local(x_shard, params, state):
        t_local = x_shard.shape[0]
        shard = jax.lax.axis_index(axis)
        # per-frame global positions → validity mask
        pos = (jax.lax.broadcasted_iota(jnp.int32, (t_local, 1), 0)[:, 0]
               + shard * t_local)
        mask = (pos < valid).astype(jnp.float32)[:, None]
        h = x_shard * mask
        h = _halo_exchange(h, halo, axis)
        hm = _halo_exchange(mask, halo, axis)
        # run the stack on slice+halo; VALID-crop back to the slice after
        # (SAME conv on the extended slice matches the global computation
        # away from the artificial halo edges, which we crop)
        hh = h[None]
        mm = hm[None, :, 0]
        hh = tdnn.frame_stack(cfg, params, state, hh, mm)
        hh = hh[0, halo: halo + t_local]
        m = mask
        if cfg.pooling == "attention":
            # online softmax over the sharded time axis: global max via
            # pmax, then psum'd exp-sums — numerically identical to the
            # full-sequence softmax (models.py:1039-1051)
            att = params["attention"]
            half = hh.shape[-1] // 2
            h1, h2 = hh[:, :half], hh[:, half:]
            scores = jnp.tanh(h1 @ att["w"] + att["b"]) @ att["v"]  # (t,)
            scores = jnp.where(m[:, 0] > 0, scores, -1e30)
            g_max = jax.lax.pmax(jnp.max(scores), axis)
            e = jnp.exp(scores - g_max) * m[:, 0]
            denom = jax.lax.psum(jnp.sum(e), axis)
            s1 = jax.lax.psum(e @ h2, axis)
            s2 = jax.lax.psum(e @ jnp.square(h2), axis)
            mean = s1 / denom
            var = s2 / denom - jnp.square(mean)
        else:
            # masked global moments via psum
            count = jax.lax.psum(jnp.sum(m), axis)
            s1 = jax.lax.psum(jnp.sum(hh * m, axis=0), axis)
            s2 = jax.lax.psum(jnp.sum(jnp.square(hh) * m, axis=0), axis)
            mean = s1 / count
            var = s2 / count - jnp.square(mean)
        pooled = jnp.concatenate(
            [mean, jnp.sqrt(jnp.maximum(var, 0.0) + tdnn.VAR2STD_EPSILON)])
        e0 = params["embed"][0]
        return (pooled @ e0["w"] + e0["b"]).astype(jnp.float32)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(), P()),
                   out_specs=P(),
                   check_vma=False)
    return fn(jnp.asarray(x, jnp.float32), params, state)
