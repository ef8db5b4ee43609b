"""Grouped OLS sufficient-statistic regression (stages/regression.py):
exact rational slope vs a numpy lstsq reference, zero-variance groups,
partial-merge invariance across block counts, and the overflow guard.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray

from go_distributed_log_search_ray.stages.regression import (
    grouped_ols_slope, ols_partials)


def _table(n=400, seed=3):
    rng = np.random.default_rng(seed)
    g = rng.choice(["a", "b", "c"], size=n)
    x = rng.integers(1, 50, size=n).astype(np.float64)
    y = np.round(x * 7.25 + rng.normal(0, 40, size=n), 2)
    return pa.table({"g": g, "x": x, "y": y})


def test_slope_matches_lstsq_reference():
    t = _table()
    out = grouped_ols_slope(ray.data.from_arrow(t), ["g"], "x", "y",
                            y_scale=100).to_pydict()
    for i, grp in enumerate(out["g"]):
        m = np.asarray(t.column("g")) == grp
        x = np.asarray(t.column("x"))[m]
        y = np.rint(np.asarray(t.column("y"))[m] * 100)
        ref = np.polyfit(x, y, 1)[0]
        got = out["slope_num"][i] / out["slope_den"][i]
        assert math.isclose(got, ref, rel_tol=1e-9)
        assert out["n_rows"][i] == int(m.sum())
        # gcd-reduced: the fraction is in lowest terms, positive den
        assert out["slope_den"][i] > 0
        assert math.gcd(abs(out["slope_num"][i]), out["slope_den"][i]) == 1


def test_block_count_invariance():
    t = _table(seed=11)
    a = grouped_ols_slope(ray.data.from_arrow(t), ["g"], "x", "y",
                          y_scale=100)
    b = grouped_ols_slope(
        ray.data.from_arrow(t).repartition(13), ["g"], "x", "y",
        y_scale=100)
    key = lambda tb: sorted(map(tuple, tb.to_pandas().values.tolist()))
    assert key(a) == key(b)


def test_zero_variance_group_emits_0_1():
    t = pa.table({"g": ["z"] * 5, "x": [3.0] * 5,
                  "y": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = grouped_ols_slope(ray.data.from_arrow(t), ["g"], "x", "y") \
        .to_pydict()
    assert out["slope_num"] == [0] and out["slope_den"] == [1]


def test_overflow_guard_raises():
    t = pa.table({"g": ["a"] * 4, "x": [3e9] * 4, "y": [3e9] * 4})
    with pytest.raises(ValueError, match="overflow"):
        ols_partials(["g"], "x", "y")(t)
