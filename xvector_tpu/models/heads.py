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


def _wmean(x: jnp.ndarray, weight, axis_name=None) -> jnp.ndarray:
    """Weighted mean over rows; with ``axis_name`` the numerator and
    denominator are psum'd across the mesh axis (shard_map regions, where
    each shard holds a slice of the batch)."""
    if weight is None:
        weight = jnp.ones(x.shape[0], x.dtype)
    num = jnp.sum(x * weight)
    den = jnp.sum(weight)
    if axis_name:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               weight=None, axis_name=None) -> jnp.ndarray:
    """Mean cross-entropy with integer labels (B,). Stable log-softmax.
    ``weight`` (B,) excludes zero-weight pad rows (mesh batch padding)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _wmean(nll, weight, axis_name)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
             weight=None, axis_name=None) -> jnp.ndarray:
    return _wmean((jnp.argmax(logits, -1) == labels).astype(jnp.float32),
                  weight, axis_name)


def sharded_softmax_ce(hidden: jnp.ndarray, weight: jnp.ndarray,
                       bias: jnp.ndarray, labels: jnp.ndarray, mesh,
                       row_weight=None,
                       axis: str = "model") -> tuple[jnp.ndarray,
                                                     jnp.ndarray]:
    """All-gather-free cross-entropy over a column-sharded classifier.

    For speaker counts far beyond one chip's HBM the (D, C) head lives
    column-sharded over the ``model`` mesh axis.  Materialising full
    (B, C) logits per replica (what naive auto-partitioning may do) costs
    an all-gather of C columns; instead each shard computes its local
    logits and only two scalars per row cross the mesh:

      * a psum-max and psum of exp for the global logsumexp,
      * a psum of the target-class logit (each label lives on one shard).

    Returns (mean CE, accuracy).  Works for any C divisible by the axis
    size; exact same value as dense softmax_ce.
    """
    try:
        from jax import shard_map           # JAX ≥ 0.7 public path
    except ImportError:                     # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis]
    c_total = weight.shape[1]
    if c_total % n_shards:
        raise ValueError(f"num classes {c_total} not divisible by "
                         f"{axis}={n_shards}")
    c_local = c_total // n_shards

    def local(h, w, b, y, rw):
        shard = jax.lax.axis_index(axis)
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        # global max for stability only — no gradient flows through it
        m_local = jnp.max(logits, axis=-1)
        m = jax.lax.stop_gradient(
            jax.lax.pmax(jax.lax.stop_gradient(m_local), axis))
        sumexp = jax.lax.psum(
            jnp.sum(jnp.exp(logits - m[:, None]), axis=-1), axis)
        # target logit: the owning shard contributes, others add 0
        local_label = y - shard * c_local
        owned = (local_label >= 0) & (local_label < c_local)
        idx = jnp.clip(local_label, 0, c_local - 1)
        tgt = jnp.take_along_axis(logits, idx[:, None], axis=-1)[:, 0]
        tgt = jax.lax.psum(jnp.where(owned, tgt, 0.0), axis)
        nll = m + jnp.log(sumexp) - tgt
        # accuracy: global argmax via (value, index) max reduction
        i_local = jnp.argmax(logits, axis=-1) + shard * c_local
        best = m   # global max (already stop-gradient)
        # tie-break: the shard holding the max reports its index
        holder = jnp.where(jax.lax.stop_gradient(m_local) >= best,
                           i_local, -1)
        pred = jax.lax.pmax(holder, axis)
        correct = (pred == y).astype(jnp.float32)
        if rw is None:
            return jnp.mean(nll), jnp.mean(correct)
        wsum = jnp.maximum(jnp.sum(rw), 1.0)
        return jnp.sum(nll * rw) / wsum, jnp.sum(correct * rw) / wsum

    rw_spec = P() if row_weight is None else P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(), rw_spec),
        out_specs=(P(), P()),
        check_vma=False)
    rw = (jnp.ones(hidden.shape[0], jnp.float32)
          if row_weight is None else row_weight)
    return fn(hidden, weight, bias, labels, rw)


def am_softmax(hidden: jnp.ndarray, weight: jnp.ndarray,
               labels: jnp.ndarray, scale: float = 30.0,
               margin: float = 0.2,
               row_weight=None,
               axis_name=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Additive-margin softmax loss.

    hidden: (B, D) embeddings; weight: (D, C) classifier (bias-free).
    Returns (mean loss, margin-free cosine logits for accuracy).
    ``axis_name``: see ``softmax_ce`` (shard_map batch axis).
    """
    h = hidden / jnp.maximum(
        jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-12)
    w = weight / jnp.linalg.norm(weight, axis=0, keepdims=True)
    cos = h @ w                                           # (B, C)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    logits = scale * (cos - margin * onehot)
    return softmax_ce(logits, labels, row_weight, axis_name), scale * cos
