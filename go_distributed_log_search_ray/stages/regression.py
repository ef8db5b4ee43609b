"""Grouped ordinary-least-squares trend fitting via exact-integer
sufficient statistics.

The classic one-pass distributed regression: OLS over (x, y) needs only
the five sums (n, Sx, Sy, Sxx, Sxy), each a semilattice partial -- so
every batch collapses to O(groups) rows inside ``map_batches`` BEFORE
the one small all-to-all groupby, and the closed form

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)

is evaluated on the driver over O(groups) rows.  Inputs are scaled to
integers (prices to cents) so the sums are EXACT and the slope is an
exact rational; it is emitted gcd-reduced as (slope_num, slope_den) --
sign-safe and bit-comparable against a HUGEINT SQL oracle with no
float-summation-order hazards anywhere.

Overflow bound (the stages/pca.py discipline): per-row |x*y| <=
2^{xy_bits}; the per-batch int64 partial is guarded by an explicit
assert, and the driver-side closed form runs on Python ints (arbitrary
precision), so a 100 TB corpus cannot wrap -- at that scale the
int64 GROUP partials are the only capacity limit, bounded by
rows_per_group * max|x*y| < 2^63 and checked per batch here.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

_STAT_COLS = ("n", "sx", "sy", "sxx", "sxy")


def ols_partials(keys: list[str], x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 1):
    """Batch fn: collapse a batch to per-group integer OLS partials.

    ``x_scale``/``y_scale`` lift fixed-decimal doubles to exact ints
    (e.g. 100 for 2-decimal prices).  A batch whose |x*y| magnitudes
    could wrap the int64 partial raises rather than silently wrapping.
    """

    def fn(batch: pa.Table) -> pa.Table:
        x = np.rint(np.asarray(batch.column(x_col), dtype=np.float64)
                    * x_scale).astype(np.int64)
        y = np.rint(np.asarray(batch.column(y_col), dtype=np.float64)
                    * y_scale).astype(np.int64)
        # bound-check in float BEFORE the int64 products (an int64 x*y
        # would already have wrapped); conservative vs the true partial
        xf, yf = np.abs(x.astype(np.float64)), np.abs(y.astype(np.float64))
        amax = float(np.maximum(xf * yf, np.maximum(xf * xf, yf)).max()) \
            if len(x) else 0.0
        if amax * max(len(x), 1) >= float(1 << 62):
            raise ValueError(
                f"ols_partials int64 partial would overflow: "
                f"max|x*y|={amax} over {len(x)} rows exceeds 2^62")
        tmp = pa.table({
            **{k: batch.column(k) for k in keys},
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "sxy": pa.array(x * y)})
        out = tmp.group_by(keys).aggregate(
            [(c, "sum") for c in _STAT_COLS])
        cols = {k: out.column(k) for k in keys}
        cols.update({c: out.column(f"{c}_sum") for c in _STAT_COLS})
        return pa.table(cols)

    return fn


def grouped_ols_slope(ds: Dataset, keys: list[str], x_col: str,
                      y_col: str, x_scale: int = 1,
                      y_scale: int = 1) -> pa.Table:
    """(keys..., n_rows, slope_num, slope_den): exact gcd-reduced OLS
    slope of y/y_scale per x/x_scale unit... in scaled-integer space:
    slope_num/slope_den = d(y*y_scale)/d(x*x_scale).  Groups where x is
    constant (zero variance) emit 0/1 -- no fit exists."""
    part = ds.map_batches(
        ols_partials(keys, x_col, y_col, x_scale, y_scale),
        batch_format="pyarrow")
    agg = part.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in _STAT_COLS])
    t = agg.take_all()                       # O(groups) driver rows
    rows = {k: [] for k in keys}
    rows.update({"n_rows": [], "slope_num": [], "slope_den": []})
    for r in t:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        den = n * int(r["sxx"]) - sx * sx
        if den == 0:
            num, den = 0, 1
        else:
            g = math.gcd(abs(num), den)
            num, den = num // g, den // g
        for k in keys:
            rows[k].append(r[k])
        rows["n_rows"].append(n)
        rows["slope_num"].append(num)
        rows["slope_den"].append(den)
    return pa.table({k: pa.array(v) for k, v in rows.items()})
