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


# -- co-partitioned (large x large) overlap join ------------------------------

def bucketed_overlap_join_agg(points: Dataset, intervals: Dataset,
                              bucket_us: int, ts_col: str = "ts",
                              value_col: str | None = None,
                              id_col: str = "interval_id",
                              start_col: str = "start_us",
                              end_col: str = "end_us") -> Dataset:
    """The escape hatch the broadcast path's docstring promises: when
    the interval side outgrows ``ray.put`` (millions of deploy/incident
    windows), co-partition BOTH sides on a coarse time bucket.  Each
    interval replicates to every bucket it overlaps (fan-out ~=
    interval_length / bucket_us -- pick bucket_us at or above the
    typical interval length); each point lands in exactly ONE bucket,
    so no match can double-count.  One union exchange, per-bucket
    vectorized interval masks, O(intervals) partial fold.  Intervals
    with zero matches produce no row (zero-fill on the tiny result if
    needed)."""
    from ray.data.aggregate import Sum

    schema = pa.schema([("bucket", pa.int64()), ("__side", pa.int8()),
                        (id_col, pa.int64()), (start_col, pa.int64()),
                        (end_col, pa.int64()), ("__ts", pa.int64()),
                        ("__cents", pa.int64())])
    empty = schema.empty_table()

    def pad_intervals(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        s = np.asarray(b.column(start_col), dtype=np.int64)
        e = np.asarray(b.column(end_col), dtype=np.int64)
        iid = np.asarray(b.column(id_col), dtype=np.int64)
        b0 = np.floor_divide(s, bucket_us)
        b1 = np.floor_divide(e - 1, bucket_us)       # [start, end)
        nonempty = e > s
        reps = np.where(nonempty, b1 - b0 + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket sequence per replica
        off = np.concatenate(([0], np.cumsum(reps)))[:-1]
        pos = np.arange(reps.sum(), dtype=np.int64) - np.repeat(off, reps)
        bk = b0[idx] + pos
        n = len(idx)
        return pa.table({
            "bucket": pa.array(bk), "__side": pa.array(
                np.zeros(n, np.int8)),
            id_col: pa.array(iid[idx]), start_col: pa.array(s[idx]),
            end_col: pa.array(e[idx]),
            "__ts": pa.nulls(n, pa.int64()),
            "__cents": pa.nulls(n, pa.int64())}, schema=schema)

    def pad_points(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        ts = b.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        ok = np.asarray(pc.is_valid(ts))
        cents = np.zeros(b.num_rows, dtype=np.int64)
        if value_col is not None:
            v = b.column(value_col)
            ok = ok & np.asarray(pc.is_valid(v))
            vv = np.asarray(pc.cast(v, pa.float64()), dtype=np.float64)
            cents[ok] = np.floor(vv[ok] * 100).astype(np.int64)
        t = np.asarray(ts, dtype=np.int64)[ok]
        cents = cents[ok]
        n = len(t)
        return pa.table({
            "bucket": pa.array(np.floor_divide(t, bucket_us)),
            "__side": pa.array(np.ones(n, np.int8)),
            id_col: pa.nulls(n, pa.int64()),
            start_col: pa.nulls(n, pa.int64()),
            end_col: pa.nulls(n, pa.int64()),
            "__ts": pa.array(t), "__cents": pa.array(cents)},
            schema=schema)

    u = points.map_batches(pad_points, batch_format="pyarrow").union(
        intervals.map_batches(pad_intervals, batch_format="pyarrow"))

    out_schema = pa.schema([(id_col, pa.int64()), ("n_rows", pa.int64()),
                            ("sum_value_cents", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        def col(name):            # nulls ride the OTHER side's rows only
            return np.asarray(pc.fill_null(t.column(name), 0),
                              dtype=np.int64)

        side = np.asarray(t.column("__side"))
        iv = side == 0
        iid = col(id_col)[iv]
        s = col(start_col)[iv]
        e = col(end_col)[iv]
        ts = col("__ts")[~iv]
        cents = col("__cents")[~iv]
        n = np.zeros(len(iid), dtype=np.int64)
        sm = np.zeros(len(iid), dtype=np.int64)
        for j in range(len(iid)):
            m = (ts >= s[j]) & (ts < e[j])
            n[j] = int(m.sum())
            sm[j] = int(cents[m].sum())
        hit = n > 0
        return pa.table({id_col: pa.array(iid[hit]),
                         "n_rows": pa.array(n[hit]),
                         "sum_value_cents": pa.array(sm[hit])},
                        schema=out_schema)

    return u.groupby("bucket").map_groups(fold, batch_format="pyarrow") \
        .groupby(id_col).aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_value_cents", alias_name="sum_value_cents"))
