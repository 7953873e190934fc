"""Tests for score conversion, report generation, h5 export, aux blocks."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvector_tpu.models import tdnn
from xvector_tpu.models.blocks import flip_gradient, selu, zrelu
from xvector_tpu.utils.export import export_h5, import_h5
from xvector_tpu.utils.scores import (generate_report,
                                      kaldi_scores_to_nist_tsv,
                                      partition_trials)


def test_partition_trials_by_language():
    trials = [("m1", "t1", 1), ("m1", "t2", 0), ("m2", "t3", 1),
              ("m2", "t9", 0)]
    utt2lang = {"t1": "tgl", "t2": "yue", "t3": "tgl"}
    parts = partition_trials(trials, utt2lang)
    assert [t[1] for t in parts["tgl"]] == ["t1", "t3"]
    assert parts["yue"] == [("m1", "t2", 0)]
    assert parts["unknown"] == [("m2", "t9", 0)]


def test_score_conversion_basic():
    lines = ["spk1 seg1 1.5", "spk1 seg2 -0.25", "spk2 seg1 3.0"]
    out = kaldi_scores_to_nist_tsv(lines)
    assert out[0] == "modelid\tsegmentid\tside\tLLR"
    assert out[1].split("\t") == ["spk1", "seg1", "a", "1.500000"]
    assert len(out) == 4


def test_score_conversion_candidate_merge():
    lines = ["s1 seg-1 1.0", "s1 seg-2 5.0", "s1 seg-3 2.0",
             "s1 other 0.5"]
    out = kaldi_scores_to_nist_tsv(lines, merge_candidates=True)
    rows = {l.split("\t")[1]: float(l.split("\t")[3]) for l in out[1:]}
    assert rows == {"seg": 5.0, "other": 0.5}   # max-pooled


def test_generate_report(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"iteration": 0, "kind": "train", "loss": 2.0,
                            "accuracy": 0.1, "lr": 1e-3,
                            "seconds": 3.5}) + "\n")
        f.write(json.dumps({"iteration": 0, "kind": "valid", "loss": 2.5,
                            "accuracy": 0.05}) + "\n")
        f.write(json.dumps({"iteration": 1, "kind": "train", "loss": 1.0,
                            "accuracy": 0.5, "lr": 9e-4,
                            "seconds": 3.4}) + "\n")
    report = generate_report(str(p))
    lines = report.strip().split("\n")
    assert lines[0].startswith("iter\tlr")
    row0 = lines[1].split("\t")
    assert row0[0] == "0"
    assert float(row0[3]) == 2.0        # train loss
    assert float(row0[4]) == 2.5        # valid loss
    assert float(row0[5]) == -0.5       # train - valid
    assert lines[2].split("\t")[4] == "-"   # no valid at iter 1


def test_h5_export_roundtrip(tmp_path):
    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(0), cfg, 5)
    p = str(tmp_path / "w.h5")
    export_h5(p, params, state)
    params2, state2 = import_h5(p, params, state)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_selu_values():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    y = np.asarray(selu(x))
    assert y[1] == 0.0
    np.testing.assert_allclose(y[2], 1.0507009873554805 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(
        y[0], 1.0507009873554805 * 1.6732632423543772 * (np.exp(-1) - 1),
        rtol=1e-6)


def test_zrelu():
    x = jnp.asarray([-2.0, 3.0])
    y = np.asarray(zrelu(x, jnp.float32(1.0), jnp.float32(0.1)))
    np.testing.assert_allclose(y, [-0.2, 3.0], rtol=1e-6)


def test_flip_gradient():
    f = lambda x: jnp.sum(flip_gradient(x, 2.0) * 3.0)
    g = jax.grad(f)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -6.0 * np.ones(4), rtol=1e-6)
    # forward is identity
    np.testing.assert_allclose(
        np.asarray(flip_gradient(jnp.asarray([1.0, -2.0]), 2.0)),
        [1.0, -2.0])


def _write_reference_h5(path, params, state, cfg):
    """Inverse of the reference's get_models_weights naming: serialise
    OUR pytrees under the TF1 variable names (models.py:55-101)."""
    import h5py

    with h5py.File(path, "w") as f:
        def w(name, arr):
            f.create_dataset(name + ":0", data=np.asarray(arr, np.float32))

        for i, layer in enumerate(params["frame"]):
            s = f"frame_level_info_layer-{i}"
            w(f"{s}/w", layer["w"]); w(f"{s}/b", layer["b"])
            w(f"{s}/gamma", layer["bn"]["gamma"])
            w(f"{s}/beta", layer["bn"]["beta"])
            w(f"{s}/mean", state["frame"][i]["mean"])
            w(f"{s}/variance", state["frame"][i]["var"])
            if "alpha" in layer:
                w(f"{s}/prelu/prelu", layer["alpha"])
        for i, layer in enumerate(params["embed"]):
            s = f"embed_layer-{i}"
            w(f"{s}/w", layer["w"]); w(f"{s}/b", layer["b"])
            w(f"{s}/gamma", layer["bn"]["gamma"])
            w(f"{s}/beta", layer["bn"]["beta"])
            w(f"{s}/mean", state["embed"][i]["mean"])
            w(f"{s}/variance", state["embed"][i]["var"])
            if "alpha" in layer:
                w(f"{s}/prelu/prelu", layer["alpha"])
        w("output/w", params["output"]["w"])
        w("output/b", params["output"]["b"])


def test_import_reference_h5_round_trip(tmp_path):
    """A reference-exported model.h5 (TF1 scope names) must land in our
    pytrees exactly, preserving the eval forward pass — trained reference
    models migrate without retraining."""
    import jax
    import jax.numpy as jnp

    from xvector_tpu.models import tdnn
    from xvector_tpu.utils.export import import_reference_h5

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(3), cfg, 11)
    p = str(tmp_path / "model.h5")
    _write_reference_h5(p, params, state, cfg)

    got_p, got_s = import_reference_h5(p, cfg, 11)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(got_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = np.random.RandomState(0).randn(2, 50, cfg.feat_dim) \
        .astype(np.float32)
    ref = tdnn.extract_xvector(cfg, params, state, x,
                               compute_dtype=jnp.float32)
    got = tdnn.extract_xvector(cfg, got_p, got_s, x,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_import_reference_h5_prelu_and_missing_bn_stats(tmp_path):
    import h5py
    import jax

    from xvector_tpu.models import tdnn
    from xvector_tpu.utils.export import import_reference_h5

    cfg = tdnn.MODEL_ZOO["prelu"]
    params, state = tdnn.init_params(jax.random.PRNGKey(1), cfg, 5)
    p = str(tmp_path / "model.h5")
    _write_reference_h5(p, params, state, cfg)
    # drop population stats (the reference export writes them
    # best-effort, models.py:203-208 try/except)
    with h5py.File(p, "a") as f:
        del f["frame_level_info_layer-0/mean:0"]
        del f["frame_level_info_layer-0/variance:0"]
    got_p, got_s = import_reference_h5(p, cfg, 5)
    np.testing.assert_array_equal(
        np.asarray(got_s["frame"][0]["mean"]),
        np.zeros_like(np.asarray(state["frame"][0]["mean"])))
    np.testing.assert_array_equal(
        np.asarray(got_p["frame"][1]["alpha"]),
        np.asarray(params["frame"][1]["alpha"]))


def test_import_reference_h5_shape_mismatch_raises(tmp_path):
    import jax
    import pytest as _pytest

    from xvector_tpu.models import tdnn
    from xvector_tpu.utils.export import import_reference_h5

    cfg = tdnn.MODEL_ZOO["tiny"]
    params, state = tdnn.init_params(jax.random.PRNGKey(1), cfg, 5)
    p = str(tmp_path / "model.h5")
    _write_reference_h5(p, params, state, cfg)
    with _pytest.raises(ValueError, match="preset"):
        import_reference_h5(p, tdnn.MODEL_ZOO["no_dropout"], 5)
