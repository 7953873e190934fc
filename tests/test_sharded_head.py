"""Sharded-classifier CE: exact parity with dense softmax CE on an
8-device mesh, gradients included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.models.heads import (accuracy, sharded_softmax_ce,
                                      softmax_ce)
from xvector_tpu.parallel import mesh as meshlib


@pytest.fixture(scope="module")
def setup():
    mesh = meshlib.make_mesh(data=2, model=4)
    rng = np.random.RandomState(0)
    b, d, c = 16, 32, 64
    hidden = jnp.asarray(rng.randn(b, d).astype(np.float32))
    weight = jnp.asarray(rng.randn(d, c).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, c, b).astype(np.int32))
    return mesh, hidden, weight, bias, labels


def test_sharded_ce_matches_dense(setup):
    mesh, hidden, weight, bias, labels = setup
    dense = float(softmax_ce(hidden @ weight + bias, labels))
    ce, acc = sharded_softmax_ce(hidden, weight, bias, labels, mesh)
    assert float(ce) == pytest.approx(dense, rel=1e-5)
    dense_acc = float(accuracy(hidden @ weight + bias, labels))
    assert float(acc) == pytest.approx(dense_acc, abs=1e-6)


def test_sharded_ce_row_weights(setup):
    mesh, hidden, weight, bias, labels = setup
    rw = jnp.asarray(([1.0] * 12 + [0.0] * 4), jnp.float32)
    ce, acc = sharded_softmax_ce(hidden, weight, bias, labels, mesh,
                                 row_weight=rw)
    dense = float(softmax_ce((hidden @ weight + bias)[:12], labels[:12]))
    assert float(ce) == pytest.approx(dense, rel=1e-5)


def test_sharded_ce_gradients_match(setup):
    mesh, hidden, weight, bias, labels = setup

    def f_dense(h, w, b):
        return softmax_ce(h @ w + b, labels)

    def f_shard(h, w, b):
        return sharded_softmax_ce(h, w, b, labels, mesh)[0]

    gd = jax.grad(f_dense, argnums=(0, 1, 2))(hidden, weight, bias)
    gs = jax.jit(jax.grad(f_shard, argnums=(0, 1, 2)))(hidden, weight,
                                                       bias)
    for a, b_ in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5)


def test_sharded_ce_rejects_indivisible(setup):
    mesh, hidden, weight, bias, labels = setup
    with pytest.raises(ValueError):
        sharded_softmax_ce(hidden, weight[:, :63], bias[:63], labels, mesh)
