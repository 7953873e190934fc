"""Schedule parity tests against the reference formulas."""

import math

import pytest

from xvector_tpu.train import schedules as S


def test_learning_rate_exponential_decay():
    # mirrors ze_utils.py:111-120 with the recipe's 1e-3 → 1e-4 range
    init, final, total = 1e-3, 1e-4, 70
    assert S.learning_rate(0, total, init, final) == pytest.approx(init)
    assert S.learning_rate(total, total, init, final) == pytest.approx(final)
    mid = S.learning_rate(35, total, init, final)
    assert mid == pytest.approx(init * math.exp(
        35 * math.log(final / init) / total))
    # final iteration pins to final rate regardless of progress
    assert S.learning_rate(10, total, init, final,
                           is_final_iter=True) == pytest.approx(final)
    # scaled by num_jobs (ze_utils.py:120)
    assert S.learning_rate(0, total, init, final, num_jobs=4) \
        == pytest.approx(4 * init)


def test_dropout_schedule_recipe_string():
    # run_xvector.sh:83: '0,0@0.10,0.1@0.50,0'
    pts = S.parse_dropout_schedule("0,0@0.10,0.1@0.50,0")
    assert pts == [(0.0, 0.0), (0.10, 0.0), (0.50, 0.1), (1.0, 0.0)]
    assert S.dropout_proportion(pts, 0.0) == 0.0
    assert S.dropout_proportion(pts, 0.05) == 0.0
    assert S.dropout_proportion(pts, 0.30) == pytest.approx(0.05)
    assert S.dropout_proportion(pts, 0.50) == pytest.approx(0.1)
    assert S.dropout_proportion(pts, 0.75) == pytest.approx(0.05)
    assert S.dropout_proportion(pts, 1.0) == 0.0


def test_dropout_schedule_bare_interior():
    # a bare interior entry means "at half of training"
    # (ze_utils.py:391-397); executed parity in test_reference_dataplane
    assert S.parse_dropout_schedule("0,0.5,0") \
        == [(0.0, 0.0), (0.5, 0.5), (1.0, 0.0)]


def test_dropout_schedule_invalid():
    with pytest.raises(ValueError):
        S.parse_dropout_schedule("0,0.1@0.8,0.2@0.3,0")  # not ascending


def test_shrink_value():
    assert S.shrink_value(10, 1e-3) == pytest.approx(0.99)
    with pytest.raises(ValueError):
        S.shrink_value(10000, 1e-3)
