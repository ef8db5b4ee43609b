"""Interval OVERLAP join: points vs a broadcast set of (possibly
overlapping) time intervals, with fan-out on multi-match.

`stages/rangejoin.py` covers the NON-overlapping case (GeoIP-style
ranges: one searchsorted per batch, exactly one match per row).  Ad-hoc
analytics need the overlapping case -- promo windows, incident windows,
deploy windows -- where one event can match several intervals and the
join multiplies rows.

Scale shape: the interval side is small by construction (thousands of
windows; it's the DIMENSION side), so it broadcasts once via
``ray.put`` and each batch evaluates one vectorized mask per interval
-- O(|intervals| x batch) comparisons, all numpy, zero shuffle.  The
event side streams.  If the interval side ever outgrows broadcast
size, the standard fix is the same time-bucket co-partitioning used by
`pipelines/streaming.py` windows (bucket both sides by coarse time
range, join within buckets); this module deliberately implements the
broadcast path only and asserts its assumption.

An aggregate-after-join helper keeps the fan-out from ever
materializing: per-batch partial sums per interval fold into one
O(|intervals|) groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

# broadcast-side sanity bound: beyond this, co-partition instead
MAX_BROADCAST_INTERVALS = 1_000_000


class _OverlapState:
    """Broadcast interval table decoded once per actor."""

    def __init__(self, ref) -> None:
        tbl: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else ref
        self.ids = np.asarray(tbl.column("interval_id"))
        self.starts = np.asarray(tbl.column("start_us"), dtype=np.int64)
        self.ends = np.asarray(tbl.column("end_us"), dtype=np.int64)


def make_intervals(ids, starts_us, ends_us) -> "ray.ObjectRef":
    """Validate + broadcast an interval table ([start, end) in epoch
    microseconds)."""
    n = len(ids)
    if n > MAX_BROADCAST_INTERVALS:
        raise ValueError(
            f"{n} intervals exceed the broadcast bound "
            f"{MAX_BROADCAST_INTERVALS}; co-partition by time bucket "
            "instead (see module docstring)")
    t = pa.table({"interval_id": pa.array(ids, pa.int64()),
                  "start_us": pa.array(starts_us, pa.int64()),
                  "end_us": pa.array(ends_us, pa.int64())})
    return ray.put(t)


def overlap_join(ds: Dataset, intervals_ref, ts_col: str = "ts",
                 keep_cols: list[str] | None = None) -> Dataset:
    """Fan each row out to every interval containing its timestamp
    (``start_us <= ts < end_us``); rows matching nothing drop (inner
    join).  Appends ``interval_id``."""

    class Join(_OverlapState):
        def __call__(self, b: pa.Table) -> pa.Table:
            cols = keep_cols or [c for c in b.column_names]
            ts = b.column(ts_col)
            if pa.types.is_timestamp(ts.type):
                ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
            t = np.asarray(ts, dtype=np.int64)
            idx_parts, iid_parts = [], []
            for j in range(len(self.ids)):
                m = (t >= self.starts[j]) & (t < self.ends[j])
                hit = np.nonzero(m)[0]
                if len(hit):
                    idx_parts.append(hit)
                    iid_parts.append(np.full(len(hit), self.ids[j],
                                             np.int64))
            if not idx_parts:
                out = b.select(cols).slice(0, 0)
                return out.append_column("interval_id",
                                         pa.array([], pa.int64()))
            idx = np.concatenate(idx_parts)
            iid = np.concatenate(iid_parts)
            out = b.select(cols).take(pa.array(idx))
            return out.append_column("interval_id", pa.array(iid))

    return ds.map_batches(Join, fn_constructor_args=(intervals_ref,),
                          batch_format="pyarrow", concurrency=(1, 8))


def overlap_join_agg(ds: Dataset, intervals_ref, ts_col: str = "ts",
                     value_col: str | None = None) -> Dataset:
    """Per-interval (n_rows, sum_value_cents) WITHOUT materializing the
    fan-out: each batch folds straight to O(|intervals|) partials."""
    from ray.data.aggregate import Sum

    class Agg(_OverlapState):
        def __call__(self, b: pa.Table) -> pa.Table:
            ts = b.column(ts_col)
            if pa.types.is_timestamp(ts.type):
                ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
            valid = pc.is_valid(ts)
            t = np.asarray(ts, dtype=np.int64)
            ok = np.asarray(valid)
            cents = None
            if value_col is not None:
                v = b.column(value_col)
                ok = ok & np.asarray(pc.is_valid(v))
                cents = np.zeros(len(t), dtype=np.int64)
                vv = np.asarray(pc.cast(v, pa.float64()), dtype=np.float64)
                # repo-wide cents convention: floor(v * 100), matching
                # CAST(floor(value * 100) AS BIGINT) in every oracle
                cents[ok] = np.floor(vv[ok] * 100).astype(np.int64)
            n = np.zeros(len(self.ids), dtype=np.int64)
            s = np.zeros(len(self.ids), dtype=np.int64)
            for j in range(len(self.ids)):
                m = ok & (t >= self.starts[j]) & (t < self.ends[j])
                n[j] = int(m.sum())
                if cents is not None:
                    s[j] = int(cents[m].sum())
            return pa.table({"interval_id": pa.array(self.ids),
                             "n_rows": pa.array(n),
                             "sum_value_cents": pa.array(s)})

    return ds.map_batches(Agg, fn_constructor_args=(intervals_ref,),
                          batch_format="pyarrow", concurrency=(1, 8)) \
        .groupby("interval_id") \
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("sum_value_cents", alias_name="sum_value_cents"))
