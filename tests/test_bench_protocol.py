"""Unit tests for bench.py's hardened slope protocol (VERDICT r4 item 1).

The protocol exists because round 4's driver JSON published a negative
train-compute slope and a 3x-inflated compute number from sequentially-timed
endpoints through relay weather. These tests pin the guard semantics: slope
from interleaved endpoint minima, one merged retry rep-set on a non-monotone
result, ``unreliable`` instead of a garbage number when the retry also fails.
Pure-host logic — no jax, no device.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import hardened_slope  # noqa: E402


def _timer(values):
    it = iter(values)

    def timed():
        return next(it)

    return timed


def test_clean_slope_from_minima():
    # k=1 endpoint minimum 2.0, k=5 endpoint minimum 10.0 -> slope 2.0;
    # additive-positive noise on other reps must not shift the result.
    small = _timer([2.5, 2.0, 9.0, 2.2])
    big = _timer([10.5, 18.0, 10.0, 11.0])
    out = hardened_slope(small, big, 1, 5, reps=4)
    assert not out["unreliable"]
    assert out["slope"] == (10.0 - 2.0) / 4
    assert out["t_small_min"] == 2.0 and out["t_big_min"] == 10.0
    # spread = worst endpoint (max-min)/min: small (9.0-2.0)/2.0 = 3.5
    assert abs(out["spread"] - 3.5) < 1e-12


def test_nonmonotone_first_round_recovers_via_retry():
    # First rep-set is non-monotone (relay spike on the small endpoint);
    # the merged retry set restores monotone minima -> reliable slope.
    small = _timer([12.0, 11.5] + [2.0, 2.1])
    big = _timer([10.0, 10.2] + [10.1, 10.3])
    out = hardened_slope(small, big, 1, 5, reps=2)
    assert not out["unreliable"]
    assert out["slope"] == (10.0 - 2.0) / 4


def test_still_nonmonotone_marks_unreliable():
    # Both rep-sets inverted (t_big <= t_small throughout): the caller must
    # see unreliable=True and publish no number.
    small = _timer([10.0] * 4)
    big = _timer([5.0] * 4)
    out = hardened_slope(small, big, 1, 5, reps=2)
    assert out["unreliable"]
    assert out["slope"] <= 0.0


def test_retry_consumes_exactly_one_extra_repset():
    # 2 reps/endpoint, non-monotone first set: exactly 2+2 calls per endpoint
    # (one merged retry), never an unbounded loop.
    calls = {"small": 0, "big": 0}

    def small():
        calls["small"] += 1
        return 10.0

    def big():
        calls["big"] += 1
        return 5.0

    hardened_slope(small, big, 1, 5, reps=2)
    assert calls == {"small": 4, "big": 4}
