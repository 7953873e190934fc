"""Pallas fused-read conv backward (ops/conv_bwd.py): gradient parity with
the XLA VJP of the shifted-dot lowering, across kernel widths and
dilations, in interpret mode (runs on the CPU test mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xvector_tpu.ops import conv_bwd as CB


@pytest.mark.parametrize("k,d,cin,cout", [
    (5, 1, 128, 128),       # layer-2 shape class
    (7, 1, 128, 256),       # layer-3 shape class (wider out)
    (3, 3, 128, 128),       # dilated-TDNN variant
    (5, 2, 128, 128),
])
def test_fused_bwd_matches_xla_vjp(k, d, cin, cout):
    B, T = 8, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, cin, cout) * 0.05, jnp.float32)
    g = jnp.asarray(rng.randn(B, T, cout), jnp.float32)
    assert CB.pallas_bwd_supported(x.shape, w.shape, d)

    y_ref, f_ref = jax.vjp(lambda x, w: CB._fwd_shifted_dots(x, w, d, T),
                           x, w)
    dx_ref, dw_ref = f_ref(g)
    y = CB.conv1d_same_fused_bwd(x, w, d, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    _, f = jax.vjp(lambda x, w: CB.conv1d_same_fused_bwd(x, w, d, True),
                   x, w)
    dx, dw = f(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,d,cin,cout", [
    (5, 1, 128, 128),
    (7, 1, 128, 256),
    (3, 3, 128, 128),
])
def test_pallas_fwd_matches_shifted_dots(k, d, cin, cout):
    """The read-once Pallas forward (the path the real TPU takes) matches
    the shifted-dot lowering; exercised directly in interpret mode since
    conv1d_same_fused_bwd keeps the XLA forward under interpret."""
    B, T = 8, 32
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, cin), jnp.float32)
    w = jnp.asarray(rng.randn(k, cin, cout) * 0.05, jnp.float32)
    y_ref = CB._fwd_shifted_dots(x, w, d, T)
    left = (k - 1) // 2 * d
    xp = jnp.pad(x, ((0, 0), (left, CB._TPAD - left), (0, 0)))
    w2d = w.reshape(k * cin, cout)
    y = CB._pallas_fwd(xp, w2d, k, d, T, x.dtype, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gating():
    # narrow front layer (23-dim MFCC) and k=1 layers must not take the
    # Pallas path; unaligned time/batch fall back too
    assert not CB.pallas_bwd_supported((8, 32, 23), (5, 23, 128), 1)
    assert not CB.pallas_bwd_supported((8, 32, 128), (1, 128, 128), 1)
    assert not CB.pallas_bwd_supported((8, 30, 128), (5, 128, 128), 1)
    assert not CB.pallas_bwd_supported((6, 32, 128), (5, 128, 128), 1)
    assert not CB.pallas_bwd_supported((8, 32, 128), (7, 128, 128), 3)


def test_trainer_flag_falls_back_on_cpu():
    """fused_conv_bwd=True must be a no-op off-TPU (and for unsupported
    shapes): one train step runs and produces finite loss."""
    from xvector_tpu.train.trainer import (TrainConfig, make_train_step)
    from xvector_tpu.models import tdnn
    import optax
    cfg = TrainConfig(model="tiny", num_targets=8,
                      compute_dtype="float32", fused_conv_bwd=True)
    model_cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), model_cfg, 8)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model_cfg, cfg, opt)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randn(4, 32, 23).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, 4).astype(np.int32))
    out = step(params, opt_state, state, batch, labels,
               jnp.int32(30), jnp.int32(4), jnp.float32(1e-3),
               jnp.float32(1.0), jnp.float32(1.0), jax.random.PRNGKey(1))
    assert np.isfinite(float(out[3]["loss"]))
