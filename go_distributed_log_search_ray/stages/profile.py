"""One-pass column profiling (``describe()`` for a 100 TB table).

Schema exploration and drift monitoring need per-column statistics --
row/null counts, numeric min/max/sum, distinct estimates -- without N
scans for N columns.  This operator folds ALL requested columns' stats
in a single streaming pass: each batch emits one tiny row per column
(per-batch partial), the shuffle is O(columns), and min/max/sum
combine exactly.

Numeric sums use the package's cents rule (floor(x*100) as int64) so
profiles are engine-exact; distinct counts are left to the HLL sketch
module (stages/sketches.py) to keep this pass O(columns) -- compose
them when approximate cardinality is wanted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def _cents(col) -> pa.Array:
    return pc.cast(pc.floor(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def profile(ds: Dataset, numeric_cols: list[str],
            other_cols: list[str] = ()) -> Dataset:
    """Per-column stats in ONE pass: (column, n_rows, n_nulls,
    min_cents, max_cents, sum_cents); non-numeric columns profile
    counts only (null mins ride as int64 nulls)."""
    cols = list(numeric_cols) + list(other_cols)
    numset = set(numeric_cols)

    def partial(b: pa.Table) -> pa.Table:
        names, rows, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in cols:
            col = b.column(c)
            names.append(c)
            rows.append(b.num_rows)
            nulls.append(col.null_count)
            if c in numset and b.num_rows - col.null_count > 0:
                cents = _cents(col)
                mins.append(pc.min(cents).as_py())
                maxs.append(pc.max(cents).as_py())
                sums.append(pc.sum(cents).as_py())
            else:
                mins.append(None)
                maxs.append(None)
                sums.append(None)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array(rows, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "min_cents": pa.array(mins, pa.int64()),
            "max_cents": pa.array(maxs, pa.int64()),
            "sum_cents": pa.array(sums, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
            Sum("sum_cents", alias_name="sum_cents"))
