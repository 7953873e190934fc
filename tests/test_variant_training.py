"""Every model-zoo variant + every head trains: loss decreases on the toy
separable task (covers BASELINE configs 2-4: AM-softmax tricks, dilated
E-TDNN-style topology, attention pooling; plus the sharded head)."""

from dataclasses import replace

import jax
import numpy as np
import pytest

from xvector_tpu.models import tdnn
from xvector_tpu.parallel import mesh as meshlib
from xvector_tpu.train.trainer import TrainConfig, Trainer

NUM_SPK = 8
FEAT = 23


def _batches(n=6, mb=8, t=48, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(NUM_SPK, FEAT) * 2.0
    out = []
    for _ in range(n):
        y = rng.randint(0, NUM_SPK, mb).astype(np.int32)
        x = (rng.randn(mb, t, FEAT) * 0.3
             + means[y][:, None, :]).astype(np.float16)
        out.append((x, y, t))
    return out


def _shrunk(preset: str) -> tdnn.TdnnConfig:
    cfg = tdnn.MODEL_ZOO[preset]
    ch = tuple(max(c // 16, 8) for c in cfg.channels)
    if cfg.pooling == "attention":
        ch = ch[:-1] + (max(ch[-1] // 2, 8) * 2,)
    return replace(cfg, channels=ch, embed_dims=(32, 32))


@pytest.mark.parametrize("preset", sorted(tdnn.MODEL_ZOO))
def test_every_variant_trains(tmp_path, preset, monkeypatch):
    small = _shrunk(preset)
    monkeypatch.setitem(tdnn.MODEL_ZOO, preset, small)
    cfg = TrainConfig(num_targets=NUM_SPK, model=preset,
                      compute_dtype="float32", block_size=2)
    mesh = meshlib.make_mesh(data=2, model=1)
    tr = Trainer(cfg, str(tmp_path / preset), mesh=mesh, feat_dim=FEAT)
    batches = _batches()
    first = tr.train_one_iteration(0, iter(batches), 2e-3, 0.1, 1.0)
    for it in range(1, 4):
        last = tr.train_one_iteration(it, iter(batches), 2e-3, 0.1, 1.0)
    assert last["loss"] < first["loss"], (preset, first, last)


@pytest.mark.parametrize("head", ["am_softmax", "sharded_softmax"])
def test_heads_train(tmp_path, head):
    cfg = TrainConfig(num_targets=NUM_SPK, model="tiny",
                      compute_dtype="float32", block_size=2, head=head)
    mesh = meshlib.make_mesh(data=2, model=4)
    tr = Trainer(cfg, str(tmp_path / head), mesh=mesh, feat_dim=FEAT)
    batches = _batches()
    first = tr.train_one_iteration(0, iter(batches), 2e-3, 0.0, 1.0)
    for it in range(1, 4):
        last = tr.train_one_iteration(it, iter(batches), 2e-3, 0.0, 1.0)
    assert last["loss"] < first["loss"]
    assert last["accuracy"] >= first["accuracy"] - 0.05
