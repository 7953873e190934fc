"""Cross-framework parity: an independent PyTorch replica of the reference
TF1 graph semantics (conv1d SAME → bias → relu → batch-norm with the
reference's exact train/eval moment rules) must match the JAX model to
float tolerance.  This guards the subtle semantics (BN eps/decay, moment
axes, stats-pooling epsilon, embed readout point) against implementation
drift in a way same-framework tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from xvector_tpu.models import tdnn

CFG = tdnn.MODEL_ZOO["tiny"]
KEY = jax.random.PRNGKey(0)


def _torch_forward(params, state, x, train):
    """Reference semantics in torch (models.py:436-534, tf_block.py:9-28):
    conv SAME/stride1 → +bias → relu → BN(batch moments in train, pop
    stats in eval, eps 1e-3) → stats pool mean‖sqrt(var+1e-5) → affines."""
    h = torch.tensor(np.asarray(x), dtype=torch.float64)   # (B, T, F)

    def bn(h, layer_p, layer_s, axes):
        gamma = torch.tensor(np.asarray(layer_p["bn"]["gamma"]),
                             dtype=torch.float64)
        beta = torch.tensor(np.asarray(layer_p["bn"]["beta"]),
                            dtype=torch.float64)
        if train:
            mean = h.mean(dim=axes)
            var = h.var(dim=axes, unbiased=False)
        else:
            mean = torch.tensor(np.asarray(layer_s["mean"]),
                                dtype=torch.float64)
            var = torch.tensor(np.asarray(layer_s["var"]),
                               dtype=torch.float64)
        return (h - mean) / torch.sqrt(var + 1e-3) * gamma + beta

    for i, layer in enumerate(params["frame"]):
        w = torch.tensor(np.asarray(layer["w"]), dtype=torch.float64)
        b = torch.tensor(np.asarray(layer["b"]), dtype=torch.float64)
        # torch conv1d wants (B, C, T) and (Cout, Cin, K); ours is
        # (K, Cin, Cout) with SAME padding
        k, d = CFG.kernel_sizes[i], CFG.dilations[i]
        wt = w.permute(2, 1, 0)
        pad = (k - 1) // 2 * d
        hc = h.permute(0, 2, 1)
        out = torch.nn.functional.conv1d(hc, wt, padding=pad, dilation=d)
        # SAME for even kernels trims the tail; all stock kernels are odd
        h = out.permute(0, 2, 1) + b
        h = torch.relu(h)
        h = bn(h, layer, state["frame"][i], axes=(0, 1))

    mean = h.mean(dim=1)
    var = h.var(dim=1, unbiased=False)
    pooled = torch.cat([mean, torch.sqrt(var + 1e-5)], dim=1)

    h = pooled
    xvector = None
    for i, layer in enumerate(params["embed"]):
        w = torch.tensor(np.asarray(layer["w"]), dtype=torch.float64)
        b = torch.tensor(np.asarray(layer["b"]), dtype=torch.float64)
        pre = h @ w + b
        if i == 0:
            xvector = pre
        h = torch.relu(pre)
        h = bn(h, layer, state["embed"][i], axes=(0,))

    w = torch.tensor(np.asarray(params["output"]["w"]),
                     dtype=torch.float64)
    b = torch.tensor(np.asarray(params["output"]["b"]),
                     dtype=torch.float64)
    return (h @ w + b).numpy(), xvector.numpy()


@pytest.fixture(scope="module")
def setup():
    params, state = tdnn.init_params(KEY, CFG, num_classes=9)
    # non-trivial population stats for the eval path
    state = jax.tree.map(
        lambda a: a + 0.2 * np.random.RandomState(7)
        .rand(*a.shape).astype(np.float32), state)
    rng = np.random.RandomState(1)
    x = rng.randn(3, 40, CFG.feat_dim).astype(np.float32)
    return params, state, x


def test_eval_forward_matches_torch(setup):
    params, state, x = setup
    out = tdnn.apply(CFG, params, state, jnp.asarray(x), train=False)
    logits_t, xvec_t = _torch_forward(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), logits_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["xvector"]), xvec_t,
                               rtol=1e-4, atol=1e-4)


def test_train_forward_matches_torch(setup):
    params, state, x = setup
    out = tdnn.apply(CFG, params, state, jnp.asarray(x), train=True)
    logits_t, xvec_t = _torch_forward(params, state, x, train=True)
    np.testing.assert_allclose(np.asarray(out["logits"]), logits_t,
                               rtol=1e-4, atol=1e-4)


def test_bn_ema_update_matches_reference_rule(setup):
    """new_pop = 0.95·old + 0.05·batch_moment (tf_block.py:20-22)."""
    params, state, x = setup
    out = tdnn.apply(CFG, params, state, jnp.asarray(x), train=True)
    h = torch.tensor(x, dtype=torch.float64)
    w = torch.tensor(np.asarray(params["frame"][0]["w"]),
                     dtype=torch.float64).permute(2, 1, 0)
    b = torch.tensor(np.asarray(params["frame"][0]["b"]),
                     dtype=torch.float64)
    conv = torch.nn.functional.conv1d(h.permute(0, 2, 1), w, padding=2)
    a = torch.relu(conv.permute(0, 2, 1) + b)
    batch_mean = a.mean(dim=(0, 1)).numpy()
    want = 0.95 * np.asarray(state["frame"][0]["mean"]) + 0.05 * batch_mean
    np.testing.assert_allclose(
        np.asarray(out["state"]["frame"][0]["mean"]), want,
        rtol=1e-4, atol=1e-5)
