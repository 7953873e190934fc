"""Model-zoo tests: shapes, BN statefulness, masking, extraction readout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.models import tdnn
from xvector_tpu.models.heads import accuracy, am_softmax, softmax_ce

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("preset", sorted(tdnn.MODEL_ZOO))
def test_forward_shapes_all_presets(preset):
    cfg = tdnn.MODEL_ZOO[preset]
    params, state = tdnn.init_params(KEY, cfg, num_classes=11)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 50, cfg.feat_dim))
    out = tdnn.apply(cfg, params, state, x, train=True,
                     rng=jax.random.PRNGKey(2), dropout_keep=0.9)
    assert out["logits"].shape == (4, 11)
    assert out["xvector"].shape == (4, cfg.xvector_dim)
    assert out["pooled"].shape == (4, cfg.pooled_dim)
    assert np.isfinite(np.asarray(out["logits"])).all()
    if cfg.l2_beta > 0:
        assert float(out["l2_loss"]) > 0.0
    else:
        assert float(out["l2_loss"]) == 0.0


def test_receptive_field_parity():
    # default and dilated topologies both see 15 frames (SURVEY §3.2)
    assert tdnn.MODEL_ZOO["no_dropout"].receptive_field == 15
    assert tdnn.MODEL_ZOO["tdnn_dilated"].receptive_field == 15


def test_bn_state_updates_in_train_only():
    cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(KEY, cfg, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 30, cfg.feat_dim)) * 3
    out_t = tdnn.apply(cfg, params, state, x, train=True)
    out_e = tdnn.apply(cfg, params, state, x, train=False)
    # train mode moved the population stats, eval mode did not
    assert not np.allclose(out_t["state"]["frame"][0]["mean"],
                           state["frame"][0]["mean"])
    np.testing.assert_array_equal(out_e["state"]["frame"][0]["mean"],
                                  state["frame"][0]["mean"])
    # EMA decay 0.95: new = 0.95*old + 0.05*batch
    batch_mean = (np.asarray(out_t["state"]["frame"][0]["mean"])
                  - 0.95 * np.asarray(state["frame"][0]["mean"])) / 0.05
    assert np.isfinite(batch_mean).all()


def test_mask_equivalence_when_unpadded():
    cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(KEY, cfg, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, cfg.feat_dim))
    full_mask = jnp.ones((2, 40))
    a = tdnn.apply(cfg, params, state, x, train=False)
    b = tdnn.apply(cfg, params, state, x, mask=full_mask, train=False)
    np.testing.assert_allclose(np.asarray(a["logits"]),
                               np.asarray(b["logits"]), atol=1e-4)


def test_masked_pooling_ignores_padding():
    """Padded frames must not change the x-vector (eval mode)."""
    cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(KEY, cfg, num_classes=5)
    t = 40
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, cfg.feat_dim))
    pad = 24
    x_padded = jnp.concatenate(
        [x, 99.0 * jnp.ones((1, pad, cfg.feat_dim))], axis=1)
    mask = jnp.concatenate([jnp.ones((1, t)), jnp.zeros((1, pad))], axis=1)
    a = tdnn.extract_xvector(cfg, params, state, x)
    b = tdnn.extract_xvector(cfg, params, state, x_padded, mask=mask)
    # conv SAME padding sees zeros at the right edge either way; masked
    # pooling must exclude the pad region entirely
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-3)


def test_extract_matches_apply_xvector():
    cfg = tdnn.MODEL_ZOO["no_dropout"]
    params, state = tdnn.init_params(KEY, cfg, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 60, cfg.feat_dim))
    out = tdnn.apply(cfg, params, state, x, train=False)
    xv = tdnn.extract_xvector(cfg, params, state, x)
    np.testing.assert_allclose(np.asarray(out["xvector"]), np.asarray(xv),
                               atol=1e-5)


def test_stats_pooling_values():
    h = jnp.asarray(np.random.RandomState(0).randn(2, 10, 4),
                    dtype=jnp.float32)
    pooled = np.asarray(tdnn.stats_pooling(h))
    want_mean = np.asarray(h).mean(1)
    want_std = np.sqrt(np.asarray(h).var(1) + 1e-5)
    np.testing.assert_allclose(pooled[:, :4], want_mean, atol=1e-5)
    np.testing.assert_allclose(pooled[:, 4:], want_std, atol=1e-5)


def test_attention_pooling_uniform_matches_stats_mean():
    """With constant attention inputs, weights are uniform ⇒ attention mean
    equals the plain time mean of h2."""
    cfg = tdnn.MODEL_ZOO["l2_lrelu_attention"]
    params, _ = tdnn.init_params(KEY, cfg, num_classes=5)
    rng = np.random.RandomState(0)
    half = cfg.channels[-1] // 2
    h2 = rng.randn(2, 12, half).astype(np.float32)
    h1 = np.ones((2, 12, half), dtype=np.float32)  # constant scores
    h = jnp.asarray(np.concatenate([h1, h2], axis=-1))
    pooled = np.asarray(tdnn.attention_pooling(h, params["attention"]))
    np.testing.assert_allclose(pooled[:, :half], h2.mean(1), atol=1e-4)


def test_softmax_ce_and_accuracy():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0], [10.0, 0.0]])
    labels = jnp.asarray([0, 1, 1])
    assert float(softmax_ce(logits, labels)) > 1.0
    np.testing.assert_allclose(float(accuracy(logits, labels)), 2 / 3)


def test_am_softmax_margin_hurts_target():
    rng = jax.random.PRNGKey(0)
    hidden = jax.random.normal(rng, (8, 16))
    weight = jax.random.normal(jax.random.PRNGKey(1), (16, 10))
    labels = jnp.arange(8) % 10
    loss_m, cos = am_softmax(hidden, weight, labels, scale=30, margin=0.2)
    loss_0, _ = am_softmax(hidden, weight, labels, scale=30, margin=0.0)
    assert float(loss_m) > float(loss_0)   # margin makes the task harder
    assert cos.shape == (8, 10)


def test_dropout_active_only_in_train():
    cfg = tdnn.MODEL_ZOO["base"]
    assert cfg.use_dropout
    params, state = tdnn.init_params(KEY, cfg, num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 30, cfg.feat_dim))
    a = tdnn.apply(cfg, params, state, x, train=True, dropout_keep=0.5,
                   rng=jax.random.PRNGKey(7))
    b = tdnn.apply(cfg, params, state, x, train=True, dropout_keep=0.5,
                   rng=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(a["logits"]), np.asarray(b["logits"]))
    # eval path needs no rng and is deterministic
    c = tdnn.apply(cfg, params, state, x, train=False)
    d = tdnn.apply(cfg, params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(c["logits"]),
                                  np.asarray(d["logits"]))


def test_etdnn_topology():
    # BASELINE.json config 3: interleaved dense layers, wider context
    cfg = tdnn.MODEL_ZOO["etdnn"]
    assert cfg.receptive_field == 23
    assert cfg.channels[-1] == 1500 and cfg.num_frame_layers == 10
