"""Auxiliary NN building blocks.

Completes the reference's ``tf_block.py`` surface beyond what the model zoo
uses day-to-day: ``selu`` (tf_block.py:31-36), ``zrelu`` — the two-slope
parametric ReLU with trainable positive/negative gains (tf_block.py:50-56)
— and ``flip_gradient``, the gradient-reversal identity backing the
(unused) adversarial hook (tf_block.py:59-77).  PReLU and the batch-norm
wrapper live in models/tdnn.py where the zoo consumes them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["selu", "zrelu", "flip_gradient"]

_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946


def selu(x: jnp.ndarray) -> jnp.ndarray:
    """scale·(x if x≥0 else α·(eˣ−1)) with the canonical SELU constants."""
    return _SELU_SCALE * jnp.where(
        x >= 0.0, x, _SELU_ALPHA * jnp.expm1(x))


def zrelu(x: jnp.ndarray, alpha1: jnp.ndarray, alpha2: jnp.ndarray
          ) -> jnp.ndarray:
    """α₁·max(0,x) + α₂·min(0,x) with trainable scalar gains (init 1, 0.1
    in the reference)."""
    return alpha1 * jnp.maximum(0.0, x) + alpha2 * jnp.minimum(0.0, x)


@jax.custom_vjp
def flip_gradient(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Identity forward, −scale·g backward (domain-adversarial training)."""
    return x


def _flip_fwd(x, scale):
    return x, scale


def _flip_bwd(scale, g):
    return (-scale * g, None)


flip_gradient.defvjp(_flip_fwd, _flip_bwd)
