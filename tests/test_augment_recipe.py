"""Augmentation-integrated recipe: augmented copies share speaker labels,
overlap bookkeeping treats them as one recording, features differ from
clean."""

import numpy as np
import pytest

from xvector_tpu.cli.run import Recipe, RecipeConfig
from xvector_tpu.data.allocator import base_utt
from xvector_tpu.io.datadir import DataDir


def test_recipe_augment_stage(tmp_path):
    rng = np.random.RandomState(0)
    waves = {f"spk{s}_u{u}": (rng.randn(8000) * 1000).astype(np.float32)
             for s in range(2) for u in range(2)}
    data = DataDir(utt2spk={u: u.split("_")[0] for u in waves})
    recipe = Recipe(RecipeConfig(work_dir=str(tmp_path)))
    rirs = [np.exp(-np.arange(100) / 20).astype(np.float32)]
    noises = [(rng.randn(2000) * 100).astype(np.float32)]
    aug, provider = recipe.augment(data, lambda u: waves[u], rirs=rirs,
                                   noises=noises)
    # 4 clean + 2 kinds × 4 = 12
    assert len(aug) == 12
    assert aug.utt2spk["spk0_u0-reverb"] == "spk0"
    assert base_utt("spk0_u0-reverb") == "spk0_u0"
    clean = provider("spk0_u0")
    reverbed = provider("spk0_u0-reverb")
    noised = provider("spk0_u0-noise")
    assert reverbed.shape == clean.shape == noised.shape
    assert not np.allclose(reverbed, clean)
    assert not np.allclose(noised, clean)
    # deterministic provider (seeded per utterance)
    np.testing.assert_array_equal(provider("spk0_u0-noise"), noised)
    # music/babble unavailable → not generated
    assert "spk0_u0-music" not in aug.utt2spk


def test_augmented_copies_inherit_clean_vad(tmp_path):
    """Reference behaviour: vad.scp of augmented lists is COPIED from the
    clean list (run.sh:141), never recomputed on corrupted audio."""
    from xvector_tpu.io import kaldi_ark as kio

    rng = np.random.RandomState(3)
    waves = {f"spk{s}_u{u}": np.concatenate([
        (rng.randn(4000) * 2000), np.zeros(4000)]).astype(np.float32)
        for s in range(2) for u in range(2)}
    data = DataDir(utt2spk={u: u.split("_")[0] for u in waves})
    recipe = Recipe(RecipeConfig(work_dir=str(tmp_path)))
    noises = [(rng.randn(2000) * 3000).astype(np.float32)]
    aug, provider = recipe.augment(data, lambda u: waves[u], noises=noises)
    feat_dir = recipe.make_features(aug, provider, split="aug",
                                    dither_seed=None)
    vads = {u: kio.read_vec_flt(loc) for u, loc in feat_dir.vad.items()}
    for u in waves:
        np.testing.assert_array_equal(vads[u + "-noise"], vads[u])
    # feats of the augmented copy still differ from clean
    f_clean = kio.read_mat(feat_dir.feats["spk0_u0"])
    f_noise = kio.read_mat(feat_dir.feats["spk0_u0-noise"])
    assert not np.allclose(f_clean, f_noise)
