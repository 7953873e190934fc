"""Fused Pallas TDNN-stack kernel vs the XLA reference (interpret mode on
CPU; the real-TPU parity run lives in the verify drive)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.models import tdnn
from xvector_tpu.ops import tdnn_kernel as TK


def _mini_cfg(**kw):
    base = dict(kernel_sizes=(5, 3, 3, 1, 1), dilations=(1, 2, 3, 1, 1),
                channels=(8, 8, 8, 8, 24), feat_dim=4)
    base.update(kw)
    return replace(tdnn.MODEL_ZOO["no_dropout"], **base)


@pytest.mark.parametrize("activation", ["relu", "lrelu", "prelu"])
def test_fused_matches_reference(activation):
    cfg = _mini_cfg(activation=activation)
    params, state = tdnn.init_params(jax.random.PRNGKey(1), cfg, 10)
    state = jax.tree.map(
        lambda a: a + 0.1 * np.random.RandomState(2)
        .rand(*a.shape).astype(np.float32), state)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 50, 4).astype(np.float32))
    mask = jnp.asarray((rng.rand(2, 50) > 0.2).astype(np.float32))
    ref = np.asarray(tdnn.frame_stack(cfg, params, state, x, mask))
    got = np.asarray(TK.fused_frame_stack(cfg, params, state, x, mask,
                                          t_tile=16, interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_fused_ragged_tile_boundary():
    """T not a multiple of t_tile: tail tile must still match."""
    cfg = _mini_cfg()
    params, state = tdnn.init_params(jax.random.PRNGKey(3), cfg, 10)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 37, 4).astype(np.float32))
    mask = jnp.ones((1, 37), jnp.float32)
    ref = np.asarray(tdnn.frame_stack(cfg, params, state, x, mask))
    got = np.asarray(TK.fused_frame_stack(cfg, params, state, x, mask,
                                          t_tile=16, interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_supports_predicate():
    assert TK.supports(tdnn.MODEL_ZOO["no_dropout"])
    assert TK.supports(tdnn.MODEL_ZOO["tdnn_dilated"])
    assert not TK.supports(tdnn.MODEL_ZOO["l2_lrelu_attention"])


def test_cpu_fallback_runs():
    cfg = _mini_cfg()
    params, state = tdnn.init_params(jax.random.PRNGKey(4), cfg, 10)
    x = jnp.ones((1, 20, 4))
    out = TK.fused_frame_stack(cfg, params, state, x)   # auto: CPU → XLA
    assert out.shape == (1, 20, 24)
