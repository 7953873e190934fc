"""Data-parallel scaling correctness on the virtual CPU mesh: the same
seeded training run must produce (nearly) identical parameters on a
1-device and an 8-device mesh — synchronous SPMD DP is a pure layout
change, unlike the reference's lossy multi-job checkpoint averaging."""

import jax
import numpy as np
import pytest

from xvector_tpu.parallel import launch, mesh as meshlib
from xvector_tpu.train.trainer import TrainConfig, Trainer

NUM_SPK = 8
FEAT = 23


def _batches(n=4, mb=16, t=64, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(NUM_SPK, FEAT) * 2.0
    out = []
    for _ in range(n):
        y = rng.randint(0, NUM_SPK, mb).astype(np.int32)
        x = (rng.randn(mb, t, FEAT) * 0.3
             + means[y][:, None, :]).astype(np.float16)
        out.append((x, y, t))
    return out


def _run(tmp_path, mesh, tag):
    cfg = TrainConfig(num_targets=NUM_SPK, model="tiny",
                      compute_dtype="float32", block_size=2)
    tr = Trainer(cfg, str(tmp_path / tag), mesh=mesh, feat_dim=FEAT)
    batches = _batches()
    for it in range(3):
        stats = tr.train_one_iteration(it, iter(batches), lr=1e-3,
                                       dropout=0.0, shrink=1.0)
    return tr, stats


def test_dp_invariance_1_vs_8(tmp_path):
    devs = jax.devices()
    assert len(devs) >= 8
    tr1, s1 = _run(tmp_path, meshlib.make_mesh(data=1, model=1,
                                               devices=devs[:1]), "m1")
    tr8, s8 = _run(tmp_path, meshlib.make_mesh(data=8, model=1,
                                               devices=devs[:8]), "m8")
    # identical math up to reduction-order rounding (the all-dots conv
    # lowering accumulates partial sums in a sharding-dependent order)
    assert abs(s1["loss"] - s8["loss"]) < 5e-3
    w1 = np.asarray(tr1.params["embed"][0]["w"])
    w8 = np.asarray(tr8.params["embed"][0]["w"])
    # Adam turns reduction-order noise in near-zero gradients into
    # lr-scale step differences on isolated elements; the loss agreement
    # above is the strict invariance
    np.testing.assert_allclose(w1, w8, atol=1e-2)


def test_dp_vs_model_parallel_equivalence(tmp_path):
    devs = jax.devices()
    tr_a, sa = _run(tmp_path, meshlib.make_mesh(data=8, model=1,
                                                devices=devs[:8]), "a")
    tr_b, sb = _run(tmp_path, meshlib.make_mesh(data=4, model=2,
                                                devices=devs[:8]), "b")
    assert abs(sa["loss"] - sb["loss"]) < 5e-3
    np.testing.assert_allclose(
        np.asarray(tr_a.params["output"]["w"]),
        np.asarray(tr_b.params["output"]["w"]), atol=1e-2)


def test_host_local_batch_slice_single_process():
    b, e = launch.host_local_batch_slice(64)
    assert (b, e) == (0, 64)
    with pytest.raises(ValueError):
        launch.host_local_batch_slice(63) if jax.process_count() > 1 \
            else (_ for _ in ()).throw(ValueError())


def test_shard_archives_single_process():
    assert launch.shard_archives(5) == [0, 1, 2, 3, 4]
