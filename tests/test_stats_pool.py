"""Pallas stats-pooling kernel: reference-path parity + custom-VJP gradient
checks (kernel itself runs on TPU; CPU tests exercise reference + backward
formula via interpret-free paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.ops import stats_pool as SP


def test_reference_matches_model_pooling():
    from xvector_tpu.models.tdnn import stats_pooling
    h = jnp.asarray(np.random.RandomState(0).randn(3, 17, 8),
                    dtype=jnp.float32)
    mask = jnp.asarray((np.random.RandomState(1).rand(3, 17) > 0.3)
                       .astype(np.float32))
    a = np.asarray(SP.stats_pool_reference(h, mask))
    b = np.asarray(stats_pooling(h, mask[..., None]))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_custom_vjp_backward_matches_autodiff():
    """The hand-written backward must equal autodiff of the reference."""
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(2, 9, 4), dtype=jnp.float32)
    mask = jnp.asarray((rng.rand(2, 9) > 0.2).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8), dtype=jnp.float32)

    # autodiff through the reference
    _, vjp_ref = jax.vjp(lambda x: SP.stats_pool_reference(x, mask), h)
    want = np.asarray(vjp_ref(g)[0])

    # hand backward via the custom_vjp rule (reference fwd supplies `out`)
    out = SP.stats_pool_reference(h, mask)
    got = np.asarray(SP._stats_pool_bwd(
        SP.VAR2STD_EPSILON, (h, mask, out), g)[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_auto_selection_on_cpu_uses_reference():
    h = jnp.ones((1, 4, 4))
    out = SP.stats_pool(h)            # must not attempt a TPU kernel on CPU
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.ones(4),
                               atol=1e-6)
