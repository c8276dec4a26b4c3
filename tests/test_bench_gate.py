"""Bench regression gate (utils/bench_gate.py): the comparison logic that
flags a silent perf loss in bench.py / scripts/bench_train.py JSON."""
import pytest

from c2matching_tpu.utils.bench_gate import gate

pytestmark = pytest.mark.fast


def test_at_pin_is_clean():
    out = gate(10.69, 10.69, higher_is_better=True, tolerance=0.05)
    assert out == {'vs_pinned': 1.0}


def test_above_pin_is_clean_higher_better():
    out = gate(11.5, 10.69, higher_is_better=True, tolerance=0.05)
    assert out['vs_pinned'] == pytest.approx(11.5 / 10.69, abs=1e-3)
    assert 'regression' not in out


def test_small_dip_within_tolerance():
    # 3% below the floor, 5% tolerance: noisy but not a regression
    out = gate(10.69 * 0.97, 10.69, higher_is_better=True, tolerance=0.05)
    assert 'regression' not in out


def test_regression_flag_higher_better(capsys):
    out = gate(9.0, 10.69, higher_is_better=True, tolerance=0.05)
    assert out['regression'] is True
    assert 'WARNING: benchmark regression' in capsys.readouterr().err


def test_lower_is_better_direction(capsys):
    # train ms/iter: going UP is the regression
    assert 'regression' not in gate(341.0, 341.0, higher_is_better=False)
    assert 'regression' not in gate(320.0, 341.0, higher_is_better=False)
    assert 'regression' not in gate(341.0 * 1.09, 341.0,
                                    higher_is_better=False, tolerance=0.10)
    out = gate(341.0 * 1.2, 341.0, higher_is_better=False, tolerance=0.10)
    assert out['regression'] is True
    assert 'WARNING: benchmark regression' in capsys.readouterr().err


def test_bad_pin_rejected():
    with pytest.raises(ValueError):
        gate(1.0, 0.0)
