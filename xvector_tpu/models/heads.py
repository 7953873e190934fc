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


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy with integer labels (B,). Stable log-softmax."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))


def am_softmax(hidden: jnp.ndarray, weight: jnp.ndarray,
               labels: jnp.ndarray, scale: float = 30.0,
               margin: float = 0.2) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Additive-margin softmax loss.

    hidden: (B, D) embeddings; weight: (D, C) classifier (bias-free).
    Returns (mean loss, margin-free cosine logits for accuracy).
    """
    h = hidden / jnp.linalg.norm(hidden, axis=-1, keepdims=True)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = h @ w                                           # (B, C)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    logits = scale * (cos - margin * onehot)
    return softmax_ce(logits, labels), scale * cos
