"""Sequence-sharded long-utterance extraction: exact match with the
single-device full-sequence x-vector (no chunk-and-average error)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.models import tdnn
from xvector_tpu.parallel import mesh as meshlib
from xvector_tpu.parallel.seqshard import seq_sharded_xvector


@pytest.fixture(scope="module")
def model():
    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 7)
    state = jax.tree.map(
        lambda a: a + 0.05 * np.random.RandomState(1)
        .rand(*a.shape).astype(np.float32), state)
    return cfg, params, state


def test_matches_full_sequence(model):
    cfg, params, state = model
    mesh = meshlib.make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    t = 800
    x = rng.randn(t, cfg.feat_dim).astype(np.float32)
    want = np.asarray(tdnn.extract_xvector(cfg, params, state, x[None]))[0]
    got = np.asarray(seq_sharded_xvector(cfg, params, state, x, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_padded_tail_masked(model):
    cfg, params, state = model
    mesh = meshlib.make_mesh(data=8, model=1)
    rng = np.random.RandomState(2)
    valid = 700
    x = np.zeros((800, cfg.feat_dim), np.float32)
    x[:valid] = rng.randn(valid, cfg.feat_dim)
    want = np.asarray(tdnn.extract_xvector(
        cfg, params, state, x[None, :valid]))[0]
    got = np.asarray(seq_sharded_xvector(cfg, params, state, x, mesh,
                                         valid_len=valid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dilated_topology(model):
    cfg = tdnn.MODEL_ZOO["tdnn_dilated"]
    from dataclasses import replace
    cfg = replace(cfg, channels=(8, 8, 8, 8, 24), embed_dims=(16, 16),
                  feat_dim=23)
    params, state = tdnn.init_params(jax.random.PRNGKey(3), cfg, 5)
    mesh = meshlib.make_mesh(data=4, model=1)
    rng = np.random.RandomState(4)
    x = rng.randn(400, 23).astype(np.float32)
    want = np.asarray(tdnn.extract_xvector(cfg, params, state, x[None]))[0]
    got = np.asarray(seq_sharded_xvector(cfg, params, state, x, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attention_pooling_online_softmax(model):
    """Attention pooling sharded over time == full-sequence softmax."""
    from dataclasses import replace
    cfg = tdnn.MODEL_ZOO["l2_lrelu_attention"]
    cfg = replace(cfg, channels=(8, 8, 8, 8, 48), embed_dims=(16, 16))
    params, state = tdnn.init_params(jax.random.PRNGKey(5), cfg, 5)
    mesh = meshlib.make_mesh(data=8, model=1)
    rng = np.random.RandomState(6)
    valid = 750
    x = np.zeros((800, cfg.feat_dim), np.float32)
    x[:valid] = rng.randn(valid, cfg.feat_dim)
    want = np.asarray(tdnn.extract_xvector(
        cfg, params, state, x[None, :valid]))[0]
    got = np.asarray(seq_sharded_xvector(cfg, params, state, x, mesh,
                                         valid_len=valid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rejects_indivisible(model):
    cfg, params, state = model
    mesh = meshlib.make_mesh(data=8, model=1)
    with pytest.raises(ValueError):
        seq_sharded_xvector(cfg, params, state,
                            np.zeros((801, cfg.feat_dim), np.float32),
                            mesh)
