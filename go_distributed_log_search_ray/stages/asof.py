"""As-of (backward) join -- a time-series operator Ray Data lacks.

For each left row, find the LATEST right row of the same key with
``right.on <= left.on`` (the classic trades->quotes / purchase->last-click
match).  The reference has no such operator (it has no relational join at
all, SURVEY 2.5); this is one of the beyond-reference time-series
operators a log/telemetry engine needs at scale.

Distributed shape (same partitioning contract as ``stages/join.hash_join``):
both sides are tagged and hash-co-partitioned by the ``by`` key in ONE
union shuffle, then each partition runs a vectorized sorted merge:

* both sides sort by (by, on) -- one Arrow ``sort_indices`` each;
* keys collapse to a single int64 composite ``rank(by) * span + (on -
  min_on)`` so ONE ``np.searchsorted`` finds every left row's backward
  match (no per-key loop); a rank/span overflow guard falls back to a
  per-key merge, which cannot happen until a partition spans ~2^62 ticks;
* matches outside the left row's key group null out (left join).

Partitioning assumption: all rows of one ``by`` key land in one
partition (hash co-partition); per-key skew bounds that partition's
memory, with the same upstream mitigations as hash_join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .join import _infer_schema, _num_partitions, _part_of


def _asof_merge_tables(lt: pa.Table, rt: pa.Table, by: str, on: str,
                       rvals: list[str], out_schema: pa.Schema) -> pa.Table:
    """Vectorized backward as-of match of two single-partition tables."""
    if lt.num_rows == 0:
        return out_schema.empty_table()
    lidx = pc.sort_indices(lt, sort_keys=[(by, "ascending"),
                                          (on, "ascending")])
    lt = lt.take(lidx)
    lb = np.asarray(lt.column(by))
    lo = np.asarray(lt.column(on).cast(pa.int64()))
    if rt.num_rows == 0:
        cols = {c: lt.column(c) for c in lt.column_names}
        for c in rvals:
            cols[c] = pa.nulls(lt.num_rows, out_schema.field(c).type)
        return pa.table(cols).cast(out_schema)
    ridx = pc.sort_indices(rt, sort_keys=[(by, "ascending"),
                                          (on, "ascending")])
    rt = rt.take(ridx)
    rb = np.asarray(rt.column(by))
    ro = np.asarray(rt.column(on).cast(pa.int64()))

    # dense-rank keys over the union so both sides share one rank space
    uniq = np.unique(np.concatenate([lb, rb]))
    lr = np.searchsorted(uniq, lb)
    rr = np.searchsorted(uniq, rb)
    tmin = min(lo.min(), ro.min())
    span = np.int64(max(lo.max(), ro.max()) - tmin + 2)
    if len(uniq) and span > 0 and int(len(uniq)) * int(span) < (1 << 62):
        lk = lr * span + (lo - tmin)
        rk = rr * span + (ro - tmin)
        # latest right key <= left key; validate same-key via rank floor
        pos = np.searchsorted(rk, lk, side="right") - 1
        valid = pos >= 0
        safe = np.where(valid, pos, 0)
        valid &= rr[safe] == lr
    else:                                   # overflow: per-key fallback
        pos = np.empty(len(lo), dtype=np.int64)
        valid = np.zeros(len(lo), dtype=bool)
        rstarts = np.searchsorted(rr, np.arange(len(uniq)))
        rends = np.searchsorted(rr, np.arange(len(uniq)), side="right")
        for i in range(len(lo)):
            s, e = rstarts[lr[i]], rends[lr[i]]
            j = np.searchsorted(ro[s:e], lo[i], side="right") - 1
            if j >= 0:
                pos[i] = s + j
                valid[i] = True
        safe = np.where(valid, pos, 0)

    take_idx = pa.array(safe.astype(np.int64), mask=~valid)
    cols = {c: lt.column(c) for c in lt.column_names}
    for c in rvals:
        cols[c] = rt.column(c).take(take_idx)
    return pa.table(cols).cast(out_schema)


def asof_join(left: Dataset, right: Dataset, by: str, on: str,
              num_partitions: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              est_bytes: int | None = None) -> Dataset:
    """Backward as-of left join: every left row, plus the value columns
    of the latest right row with the same ``by`` key and
    ``right.on <= left.on`` (null if none).  Column names other than
    ``by``/``on`` must be disjoint across sides."""
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    lsch = left_schema or _infer_schema(left, by)
    rsch = right_schema or _infer_schema(right, by)
    lcols = [n for n in lsch.names]
    rvals = [n for n in rsch.names if n not in (by, on)]
    clash = (set(lcols) - {by, on}) & set(rvals)
    if clash:
        raise ValueError(f"non-key column name clash: {sorted(clash)}")

    p = 1
    target_p = num_partitions or _num_partitions(est_bytes)
    while p < target_p:
        p *= 2

    union_schema = pa.schema(
        [(n, lsch.field(n).type) for n in lcols]
        + [(n, rsch.field(n).type) for n in rvals]
        + [("__side", pa.int8()), ("__part", pa.int32())])
    empty_union = union_schema.empty_table()
    order = lcols + rvals + ["__side", "__part"]

    def pad(side: int):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty_union
            if side == 0:
                for n in rvals:
                    b = b.append_column(n, pa.nulls(b.num_rows,
                                                    rsch.field(n).type))
            else:
                for n in lcols:
                    if n not in (by, on):
                        b = b.append_column(n, pa.nulls(b.num_rows,
                                                        lsch.field(n).type))
            b = b.append_column("__side", pa.array(
                np.full(b.num_rows, side, dtype=np.int8)))
            b = b.append_column("__part", _part_of(b.column(by), p))
            return b.select(order).cast(union_schema)
        return f

    unioned = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow"))

    out_schema = pa.schema([(n, lsch.field(n).type) for n in lcols]
                           + [(n, rsch.field(n).type) for n in rvals])
    out_empty = out_schema.empty_table()

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        side = t.column("__side")
        lt = t.filter(pc.equal(side, 0)).select(lcols)
        rt = t.filter(pc.equal(side, 1)).select([by, on] + rvals)
        return _asof_merge_tables(lt, rt, by, on, rvals, out_schema)

    def canon(t: pa.Table) -> pa.Table:
        return t if t.num_rows else out_empty

    return unioned.groupby("__part") \
        .map_groups(merge, batch_format="pyarrow") \
        .map_batches(canon, batch_format="pyarrow")
