"""Classifier heads and losses.

* :func:`softmax_ce` — mean softmax cross-entropy + accuracy, the reference's
  training objective (``models.py:511-517``: ``softmax_cross_entropy_with
  _logits`` → ``reduce_mean``).
* :func:`am_softmax` — additive-margin softmax (CosFace-style) head for the
  "training tricks" configuration (BASELINE.json config 2).  Not present in
  the reference; standard formulation: logits = s·(cos θ − m·1{target}).

Both work unchanged on a classifier weight sharded over a ``model`` mesh
axis: under pjit the per-row max / logsumexp reductions over the class axis
lower to XLA collectives across the shard, so no bespoke collective code is
needed until the speaker count outgrows one chip's HBM by a large factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["softmax_ce", "accuracy", "am_softmax"]


def _wmean(x: jnp.ndarray, weight) -> jnp.ndarray:
    if weight is None:
        return jnp.mean(x)
    return jnp.sum(x * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weight=None) -> jnp.ndarray:
    """Mean cross-entropy with integer labels (B,). Stable log-softmax.
    ``weight`` (B,) excludes zero-weight pad rows (mesh batch padding)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _wmean(nll, weight)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
             weight=None) -> jnp.ndarray:
    return _wmean((jnp.argmax(logits, -1) == labels).astype(jnp.float32),
                  weight)


def am_softmax(hidden: jnp.ndarray, weight: jnp.ndarray,
               labels: jnp.ndarray, scale: float = 30.0,
               margin: float = 0.2,
               row_weight=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Additive-margin softmax loss.

    hidden: (B, D) embeddings; weight: (D, C) classifier (bias-free).
    Returns (mean loss, margin-free cosine logits for accuracy).
    """
    h = hidden / jnp.maximum(
        jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-12)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = h @ w                                           # (B, C)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    logits = scale * (cos - margin * onehot)
    return softmax_ce(logits, labels, row_weight), scale * cos
