"""Adam with TF1 ``tf.train.AdamOptimizer`` update semantics, exactly.

The reference trains with ``tf.train.AdamOptimizer`` (``/root/reference/
local/tf/models.py:518``).  TF1's Adam applies the formula from just
before Section 2.1 of Kingma & Ba (the form TF documents explicitly),
NOT Algorithm 1:

    m_t = b1·m + (1-b1)·g
    v_t = b2·v + (1-b2)·g²
    lr_t = lr · sqrt(1 - b2^t) / (1 - b1^t)
    θ  -= lr_t · m_t / (sqrt(v_t) + eps)

``optax.adam`` implements Algorithm 1 instead: it bias-corrects m and v
and adds eps AFTER the bias-corrected sqrt, i.e. it divides by
``sqrt(v_t) + eps·sqrt(1-b2^t)``.  The two differ only in epsilon
placement — per step the parameter delta is bounded by
``lr_t·eps·(1/sqrt(1-b2^t) - 1)/sqrt(v_t)``, negligible for gradients
≫ eps but visible (1e-4-ish) on near-zero-gradient parameters in the
first steps.  This transform reproduces the TF placement bit-for-bit so
one optimizer step matches the executed reference to float tolerance
(validated in ``tests/test_reference_executed.py`` against the actual
TF1 graph).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["tf_adam", "TfAdamState"]


class TfAdamState(NamedTuple):
    count: chex.Array   # int32 step counter (t after the increment)
    mu: optax.Updates
    nu: optax.Updates


def tf_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8) -> optax.GradientTransformation:
    """TF1-exact Adam (defaults = ``tf.train.AdamOptimizer`` defaults).

    ``learning_rate`` is a plain numeric arg so the trainer can thread
    the per-iteration schedule through ``optax.inject_hyperparams``.
    """

    def init_fn(params):
        return TfAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
                          state.nu, updates)
        t = count.astype(jnp.float32)
        lr_t = (learning_rate * jnp.sqrt(1.0 - jnp.power(b2, t))
                / (1.0 - jnp.power(b1, t)))
        new_updates = jax.tree.map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu)
        return new_updates, TfAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)
