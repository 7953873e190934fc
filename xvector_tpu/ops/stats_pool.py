"""Pallas fused statistics-pooling kernel.

Computes masked mean ‖ sqrt(var + 1e-5) over the time axis of a (B, T, C)
activation block in one VMEM pass — the reference's ``tf.nn.moments`` +
concat (``models.py:485-486``) reads the activation twice from HBM; fusing
the two moments halves the HBM traffic of the pooling boundary, which is the
bandwidth-bound step between the conv stack and the embedding matmuls.

A pure-XLA fallback (`stats_pool_reference`) keeps CPU tests exact; the
public :func:`stats_pool` picks the kernel on TPU and the fallback
elsewhere, and both share a custom-VJP backward so training uses the same
fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VAR2STD_EPSILON = 1e-5

__all__ = ["stats_pool", "stats_pool_reference"]


def stats_pool_reference(h: jnp.ndarray, mask=None,
                         eps: float = VAR2STD_EPSILON) -> jnp.ndarray:
    """XLA reference: identical math to models/tdnn.stats_pooling."""
    h32 = h.astype(jnp.float32)
    if mask is None:
        mean = jnp.mean(h32, axis=1)
        var = jnp.mean(jnp.square(h32), axis=1) - jnp.square(mean)
    else:
        m = mask.astype(jnp.float32)[..., None]
        count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(h32 * m, axis=1) / count
        var = jnp.sum(jnp.square(h32) * m, axis=1) / count \
            - jnp.square(mean)
    return jnp.concatenate(
        [mean, jnp.sqrt(jnp.maximum(var, 0.0) + eps)], axis=-1)


def _pool_kernel(h_ref, m_ref, out_ref, *, eps: float):
    """One (1, T, C_block) tile: both moments in a single read."""
    h = h_ref[0].astype(jnp.float32)               # (T, Cb)
    m = m_ref[0].astype(jnp.float32)               # (T, 1)
    count = jnp.maximum(jnp.sum(m), 1.0)
    hm = h * m
    mean = jnp.sum(hm, axis=0, keepdims=True) / count       # (1, Cb)
    var = jnp.sum(hm * h, axis=0, keepdims=True) / count \
        - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    out_ref[0, 0, :] = mean[0]
    out_ref[0, 1, :] = std[0]


def _pool_fwd_pallas(h, mask, eps):
    b, t, c = h.shape
    c_block = min(c, 512)
    if c % c_block:
        c_block = 128 if c % 128 == 0 else c
    grid = (b, c // c_block)
    out = pl.pallas_call(
        functools.partial(_pool_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, c_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c_block), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
    )(h, mask[..., None].astype(h.dtype))
    return out.reshape(b, 2 * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stats_pool_masked(h, mask, eps):
    return _pool_fwd_pallas(h, mask, eps)


def _stats_pool_fwd(h, mask, eps):
    out = _pool_fwd_pallas(h, mask, eps)
    return out, (h, mask, out)


def _stats_pool_bwd(eps, res, g):
    """d/dh of [mean, sqrt(var+eps)]: dmean/dh = m/count;
    dstd/dh = m*(h-mean)/(count*std)."""
    h, mask, out = res
    b, t, c = h.shape
    m = mask.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)  # (B,1,1)
    mean = out[:, :c][:, None, :]
    std = out[:, c:][:, None, :]
    g_mean = g[:, :c][:, None, :]
    g_std = g[:, c:][:, None, :]
    h32 = h.astype(jnp.float32)
    dh = (g_mean + g_std * (h32 - mean) / std) * (m / count)
    return dh.astype(h.dtype), None


_stats_pool_masked.defvjp(_stats_pool_fwd, _stats_pool_bwd)


def stats_pool(h: jnp.ndarray, mask=None,
               eps: float = VAR2STD_EPSILON,
               use_pallas: bool | None = None) -> jnp.ndarray:
    """Fused masked stats pooling: (B, T, C) → (B, 2C) f32.

    ``use_pallas=None`` auto-selects: Pallas kernel on TPU backends,
    XLA reference elsewhere (CPU tests, interpret-unfriendly shapes).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return stats_pool_reference(h, mask, eps)
    b, t, c = h.shape
    if mask is None:
        mask = jnp.ones((b, t), h.dtype)
    return _stats_pool_masked(h, mask, eps)
