"""Relational/windowed operators over the driver's TPC-H-ish tables --
the oracle-checked query surface (groupby-aggregate, sort-limit,
broadcast join, filter, tumbling windows, sessionization).

Numeric rule for exact oracle equality: any SUM over doubles is summed as
``floor(x * 100)`` int64 "cents" so Ray and DuckDB agree bit-exactly
regardless of float summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.tableops import global_topk, read_clean, small_table


def _read(sf_dir: str, table: str, columns=None) -> Dataset:
    return read_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.floor(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _sorted_table(ds: Dataset, keys: list[str]) -> pa.Table:
    return small_table(ds, sort_keys=keys)


# -- Q1-style pricing summary ---------------------------------------------

def q1_pricing(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("qty_cents", _cents(b.column("l_quantity")))
        b = b.append_column("price_cents", _cents(b.column("l_extendedprice")))
        g = b.select(["l_returnflag", "l_linestatus", "qty_cents", "price_cents"]) \
             .group_by(["l_returnflag", "l_linestatus"])
        out = g.aggregate([("qty_cents", "sum"), ("price_cents", "sum"),
                           ("qty_cents", "count")])
        return out.rename_columns(["l_returnflag", "l_linestatus",
                                   "sum_qty_cents", "sum_price_cents", "row_count"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("row_count", alias_name="row_count"))
    return _sorted_table(agg, ["l_returnflag", "l_linestatus"])


# -- revenue filter (Q6-style) ---------------------------------------------

def revenue_filter(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        from datetime import datetime
        sd = b.column("l_shipdate")
        lo = pa.scalar(datetime(1995, 1, 1), type=sd.type)
        hi = pa.scalar(datetime(1996, 1, 1), type=sd.type)
        mask = pc.and_(pc.and_(pc.greater_equal(sd, lo), pc.less(sd, hi)),
                       pc.and_(pc.greater_equal(b.column("l_discount"), pa.scalar(0.05)),
                               pc.and_(pc.less_equal(b.column("l_discount"), pa.scalar(0.07)),
                                       pc.less(b.column("l_quantity"), pa.scalar(24.0)))))
        f = b.filter(mask)
        rev = _cents(pc.multiply(f.column("l_extendedprice"), f.column("l_discount")))
        return pa.table({
            "revenue_cents": pa.array([pc.sum(rev).as_py() or 0], type=pa.int64()),
            "row_count": pa.array([f.num_rows], type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    t = small_table(partials)
    return pa.table({
        "revenue_cents": pa.array([pc.sum(t.column("revenue_cents")).as_py() or 0]),
        "row_count": pa.array([pc.sum(t.column("row_count")).as_py() or 0]),
    })


# -- sort-limit -------------------------------------------------------------

def top_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Distributed exact top-k: per-batch combine then an O(k x blocks)
    fold -- NOT a global sort of the whole table (the knn_bruteforce
    combine pattern applied to sort-limit)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return global_topk(ds, k, [("o_totalprice", "descending"),
                               ("o_orderkey", "ascending")])


# -- large x large shuffle join ---------------------------------------------

def order_lineitem_join(sf_dir: str) -> pa.Table:
    """Revenue per order priority over lineitem JOIN orders -- the one
    query where NEITHER side is broadcastable (the reference has no
    relational join at all, SURVEY 2.5; a 100 TB training-data engine
    needs one).  Uses the co-partitioned shuffle ``hash_join``
    (stages/join.py): both sides move exactly once on the key hash, then
    per-partition Arrow C++ joins; the post-join aggregate is the usual
    partial-combine + tiny groupby."""
    from ..stages.join import hash_join

    import os

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    # bytes-aware partitioning: parquet file sizes x3 (columnar
    # decompression expansion) feed the 256 MiB/partition target
    est = 3 * sum(os.path.getsize(f"{sf_dir}/{t}.parquet")
                  for t in ("lineitem", "orders"))
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        est_bytes=est,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]))

    def partial(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))))
        t = pa.table({"o_orderpriority": b.column("o_orderpriority"),
                      "rev_cents": rev})
        g = t.group_by(["o_orderpriority"])
        out = g.aggregate([("rev_cents", "sum"), ("rev_cents", "count")])
        return out.rename_columns(["o_orderpriority", "rev_cents",
                                   "line_count"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("line_count", alias_name="line_count"))
    return small_table(agg, sort_keys=["o_orderpriority"],
                       int64_cols=["rev_cents", "line_count"]) \
        .select(["o_orderpriority", "rev_cents", "line_count"])


# -- broadcast hash join ----------------------------------------------------

class SegmentLookup:
    """Broadcast small-side join: customer dict resolved once per actor
    (reference lookup pattern, SURVEY 2.5)."""

    def __init__(self, cust_ref) -> None:
        c = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) else cust_ref
        self.seg = c

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("o_custkey")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        d = keys.dictionary_encode()
        lut = pa.array([self.seg.get(k) for k in d.dictionary.to_pylist()],
                       type=pa.string())
        seg = pc.take(lut, d.indices)
        return batch.append_column("c_mktsegment", seg)


def orders_by_segment(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(cust.column("c_custkey").to_pylist(),
                   cust.column("c_mktsegment").to_pylist()))
    ref = ray.put(seg)
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = ds.map_batches(SegmentLookup, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=(1, 8))

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("price_cents", _cents(b.column("o_totalprice")))
        g = b.select(["c_mktsegment", "price_cents"]).group_by(["c_mktsegment"])
        out = g.aggregate([("price_cents", "sum"), ("price_cents", "count")])
        return out.rename_columns(["c_mktsegment", "sum_price_cents", "order_count"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("order_count", alias_name="order_count"))
    return _sorted_table(agg, ["c_mktsegment"])


def revenue_by_region(sf_dir: str) -> pa.Table:
    """Orders revenue per region: the classic 3-level dimension chain
    (customer -> nation -> region) resolved as ONE composed broadcast
    lookup (all three dimension tables are small; the reference's
    broadcast-small-side pattern, SURVEY 2.5) -- no shuffle join, the
    fact table streams once."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation.column("n_nationkey").to_pylist(),
                   nation.column("n_regionkey").to_pylist()))
    r2n = dict(zip(region.column("r_regionkey").to_pylist(),
                   region.column("r_name").to_pylist()))
    c2region = {c: r2n.get(n2r.get(n))
                for c, n in zip(cust.column("c_custkey").to_pylist(),
                                cust.column("c_nationkey").to_pylist())}
    ref = ray.put(c2region)

    class RegionLookup:
        def __init__(self, r) -> None:
            self.m = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b.column("o_custkey")
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            d = keys.dictionary_encode()
            lut = pa.array([self.m.get(k) for k in d.dictionary.to_pylist()],
                           type=pa.string())
            return b.append_column("r_name", pc.take(lut, d.indices))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = ds.map_batches(RegionLookup, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=(1, 8))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"r_name": b.column("r_name"),
                      "price_cents": _cents(b.column("o_totalprice"))})
        g = t.group_by(["r_name"])
        out = g.aggregate([("price_cents", "sum"), ("price_cents", "count")])
        return out.rename_columns(["r_name", "sum_price_cents", "order_count"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("r_name").aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("order_count", alias_name="order_count"))
    return small_table(agg, sort_keys=["r_name"],
                       int64_cols=["sum_price_cents", "order_count"]) \
        .select(["r_name", "sum_price_cents", "order_count"])


def part_type_revenue(sf_dir: str) -> pa.Table:
    """Lineitem revenue per part type via the co-partitioned shuffle
    join on the part key (a second large x large join exercising a
    different key distribution than order_lineitem_join)."""
    from ..stages.join import hash_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = hash_join(
        li, part, on="l_partkey", right_on="p_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("p_type", pa.string())]))

    def partial(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))))
        t = pa.table({"p_type": b.column("p_type"), "rev_cents": rev})
        g = t.group_by(["p_type"])
        out = g.aggregate([("rev_cents", "sum"), ("rev_cents", "count")])
        return out.rename_columns(["p_type", "rev_cents", "line_count"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_type").aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("line_count", alias_name="line_count"))
    return small_table(agg, sort_keys=["p_type"],
                       int64_cols=["rev_cents", "line_count"]) \
        .select(["p_type", "rev_cents", "line_count"])


def supplier_nation_acctbal(sf_dir: str) -> pa.Table:
    """Supplier account balances per nation (broadcast dimension)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    n2name = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    ref = ray.put(n2name)

    class NationLookup:
        def __init__(self, r) -> None:
            self.m = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b.column("s_nationkey")
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            d = keys.dictionary_encode()
            lut = pa.array([self.m.get(k) for k in d.dictionary.to_pylist()],
                           type=pa.string())
            return b.append_column("n_name", pc.take(lut, d.indices))

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    joined = ds.map_batches(NationLookup, fn_constructor_args=(ref,),
                            batch_format="pyarrow", concurrency=1)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"n_name": b.column("n_name"),
                      "bal_cents": _cents(b.column("s_acctbal"))})
        g = t.group_by(["n_name"])
        out = g.aggregate([("bal_cents", "sum"), ("bal_cents", "count")])
        return out.rename_columns(["n_name", "bal_cents", "supplier_count"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("bal_cents", alias_name="bal_cents"),
            Sum("supplier_count", alias_name="supplier_count"))
    return small_table(agg, sort_keys=["n_name"],
                       int64_cols=["bal_cents", "supplier_count"]) \
        .select(["n_name", "bal_cents", "supplier_count"])


def events_props_agg(sf_dir: str) -> pa.Table:
    """The DECLARED dynamic_object path over driver data: the events
    ``props`` column (schemaless JSON strings) parses through
    ``parse_dynamic_object_column`` into a map, the 'k' entry is
    extracted vectorized from the map buffers, and the sum folds per
    event type -- oracle via DuckDB json_extract."""
    from ..config.schema import DYNAMIC_OBJECT, FieldSpec
    from ..functions.parsers import parse_column

    ds = _read(sf_dir, "events", ["event_type", "props"])
    spec = FieldSpec("props", DYNAMIC_OBJECT)

    def parse(b: pa.Table) -> pa.Table:
        m = parse_column(b.column("props"), spec)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        offsets = np.asarray(m.offsets)
        keys = np.asarray(m.keys.to_pylist(), dtype=object)
        items = m.items
        hit = np.nonzero(keys == "k")[0]
        # first 'k' entry per row (rows without one -> null)
        row_of = np.searchsorted(offsets[1:], hit, side="right")
        kv = np.full(b.num_rows, None, dtype=object)
        vals = pc.cast(items.take(pa.array(hit)), pa.int64()).to_pylist()
        for r, v in zip(row_of[::-1], vals[::-1]):   # first wins
            kv[r] = v
        t = pa.table({"event_type": b.column("event_type"),
                      "k": pa.array(kv.tolist(), pa.int64())})
        g = t.group_by(["event_type"])
        out = g.aggregate([("k", "sum"), ("k", "count")])
        return out.rename_columns(["event_type", "sum_k", "n_events"])

    agg = ds.map_batches(parse, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Sum("n_events", alias_name="n_events"))
    return small_table(agg, sort_keys=["event_type"],
                       int64_cols=["sum_k", "n_events"]) \
        .select(["event_type", "sum_k", "n_events"])


# -- events: routing aggregate, tumbling window, sessions -------------------

def events_route_agg(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.bit_wise_and(b.column("user_id"), pa.scalar(7)),
                         pa.int64())  # user_id % 8 (non-negative ids)
        b = b.append_column("user_bucket", bucket)
        b = b.append_column("value_cents", _cents(b.column("value")))
        g = b.select(["event_type", "user_bucket", "value_cents"]) \
             .group_by(["event_type", "user_bucket"])
        out = g.aggregate([("value_cents", "sum"), ("value_cents", "count")])
        return out.rename_columns(["event_type", "user_bucket",
                                   "sum_value_cents", "event_count"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "user_bucket"]).aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("event_count", alias_name="event_count"))
    return _sorted_table(agg, ["event_type", "user_bucket"])


def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling 1h processing-window counts (reference commit-interval
    analog, SURVEY 2.10) keyed by integer epoch-hour for exact compare."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        epoch_us = pc.cast(b.column("ts"), pa.int64())
        hour = pc.multiply(pc.divide(epoch_us, pa.scalar(3_600_000_000)),
                           pa.scalar(3600))  # int floor-div for us -> s
        b = pa.table({"hour_epoch": pc.cast(hour, pa.int64()),
                      "value_cents": _cents(b.column("value"))})
        g = b.group_by(["hour_epoch"])
        out = g.aggregate([("value_cents", "sum"), ("value_cents", "count")])
        return out.rename_columns(["hour_epoch", "sum_value_cents", "event_count"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour_epoch").aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("event_count", alias_name="event_count"))
    return _sorted_table(agg, ["hour_epoch"])


def events_distinct_users(sf_dir: str) -> pa.Table:
    """COUNT(DISTINCT user) per event type, shuffle-minimal: per-batch
    unique (type, user) pairs first (the combiner shrinks the shuffle to
    at most |types|x|users| rows per block), then a global pair dedup via
    groupby, then a tiny per-type fold -- the standard distributed
    distinct pattern, no per-group Python."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def uniq_pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate(
            [("user_id", "count")])
        return g.rename_columns(["event_type", "user_id", "cnt"])

    # global pair dedup: one output row per distinct (type, user)
    pairs = ds.map_batches(uniq_pairs, batch_format="pyarrow") \
        .groupby(["event_type", "user_id"]).aggregate(
            Sum("cnt", alias_name="cnt"))

    def per_type(b: pa.Table) -> pa.Table:
        g = b.select(["event_type"]).group_by(["event_type"]).aggregate(
            [("event_type", "count")])
        return g.rename_columns(["event_type", "distinct_users"])

    agg = pairs.map_batches(per_type, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("distinct_users", alias_name="distinct_users"))
    t = _sorted_table(agg, ["event_type"])
    return pa.table({"event_type": t.column("event_type"),
                     "distinct_users": t.column("distinct_users").cast(pa.int64())})


def _session_buckets() -> int:
    """Coarse-bucket count for the sessionization shuffle, scaled to the
    cluster: ~2 buckets per CPU slot (power of two for the mask, floor
    64), so max parallelism grows with the cluster instead of a constant
    while each map_groups call still amortizes one vectorized pandas
    pass over many users (measured: 8x-per-CPU made 256 near-empty
    groups at 32 CPUs and tripled wall time at sf0.1).  Each group
    materializes ~1/P of the table, so P also bounds per-task memory."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    p = 64
    while p < cpus * 2:
        p *= 2
    return min(p, 1 << 15)


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Gap-based sessionization per user.  Shuffle on a COARSE
    cluster-scaled user bucket, then ONE Arrow sort + numpy diff/reduceat
    pass per bucket -- blocks stay Arrow end-to-end (a single pandas
    block would flip the downstream shuffle to pandas and re-type int64
    columns), and the per-group kernel is all C: sort_indices, boundary
    diff, add.reduceat.  Per-user map_groups would pay one Python call
    per user; per-bucket pandas paid frame-construction + object dtype
    costs that regressed 3.8x at sf0.1."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = np.int64(gap_minutes * 60) * 1_000_000
    nb = _session_buckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_sessions", pa.int64()),
                            ("n_events", pa.int64())])

    def sessions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending")])
        t = t.take(idx)
        uid = np.asarray(t.column("user_id"))
        ts = np.asarray(t.column("ts").cast(pa.timestamp("us"))
                        .cast(pa.int64()))  # us since epoch
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts |= new_user
        bounds = np.nonzero(new_user)[0]
        n_sessions = np.add.reduceat(starts.astype(np.int64), bounds)
        n_events = np.diff(np.append(bounds, n))
        return pa.table({"user_id": pa.array(uid[bounds]),
                         "n_sessions": pa.array(n_sessions),
                         "n_events": pa.array(n_events)},
                        schema=out_schema)

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("ubucket").map_groups(sessions, batch_format="pyarrow")
    t = _sorted_table(out, ["user_id"])
    return pa.table({"user_id": t.column("user_id"),
                     "n_sessions": t.column("n_sessions").cast(pa.int64()),
                     "n_events": t.column("n_events").cast(pa.int64())})


def events_funnel(sf_dir: str,
                  steps: tuple = ("view", "click", "purchase")) -> pa.Table:
    """Ordered-sequence funnel: per step s, how many users have a
    strictly-time-increasing chain step1 < step2 < ... < s in their
    event stream.  Greedy earliest-match per step is EXACT for chain
    existence (taking the earliest possible occurrence at each step
    never forecloses a later chain), which is also what a min()-cascade
    SQL oracle computes -- so the answer is integer-exact.

    Same scale shape as ``events_sessions``: one COARSE user-bucket
    shuffle, then per bucket one Arrow sort + one numpy
    ``minimum.reduceat`` pass PER STEP (all C kernels, no per-user
    Python); each bucket emits len(steps) partial counts, the final
    aggregate moves O(buckets x steps) rows."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    nb = _session_buckets()
    INF = np.int64(np.iinfo(np.int64).max)

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))

    out_schema = pa.schema([("step", pa.int64()),
                            ("n_users", pa.int64())])

    def funnel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending")])
        t = t.take(idx)
        uid = np.asarray(t.column("user_id"))
        ts = np.asarray(t.column("ts").cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        code = np.asarray(pc.fill_null(pc.index_in(
            t.column("event_type").combine_chunks(),
            value_set=pa.array(list(steps))), -1), dtype=np.int64)
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        bounds = np.nonzero(new_user)[0]
        seg_len = np.diff(np.append(bounds, n))
        prev = np.full(len(bounds), -INF)       # per-user watermark
        counts = []
        for s in range(len(steps)):
            mask = (code == s) & (ts > np.repeat(prev, seg_len))
            masked = np.where(mask, ts, INF)
            earliest = np.minimum.reduceat(masked, bounds)
            counts.append(int((earliest < INF).sum()))
            prev = earliest                     # INF blocks later steps
        return pa.table({"step": pa.array(
            np.arange(1, len(steps) + 1, dtype=np.int64)),
            "n_users": pa.array(np.array(counts, np.int64))},
            schema=out_schema)

    from ray.data.aggregate import Sum
    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("ubucket").map_groups(funnel, batch_format="pyarrow") \
            .groupby("step").aggregate(Sum("n_users",
                                           alias_name="n_users"))
    t = _sorted_table(out, ["step"])
    return pa.table({
        "step": t.column("step").cast(pa.int64()),
        "event_type": pa.array([steps[int(s) - 1]
                                for s in t.column("step").to_pylist()]),
        "n_users": t.column("n_users").cast(pa.int64())})


def events_retention(sf_dir: str) -> pa.Table:
    """Cohort retention: users grouped by their FIRST active week
    (cohort), counted per (cohort, week-offset) they were active in --
    the classic growth-analytics triangle.  One coarse user-bucket
    shuffle puts each user's whole history in one task; per bucket one
    Arrow sort + numpy reduceat finds the cohort week, then distinct
    (user, week) pairs collapse to per-(cohort, offset) partial counts
    before the O(cohorts x offsets) final aggregate -- nothing
    per-user ever reaches the driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = _session_buckets()
    US_PER_WEEK = np.int64(7 * 24 * 3600) * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))

    out_schema = pa.schema([("cohort_week", pa.int64()),
                            ("week_offset", pa.int64()),
                            ("n_users", pa.int64())])

    def retention(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending"),
                                            ("ts", "ascending")])
        t = t.take(idx)
        uid = np.asarray(t.column("user_id"))
        week = np.asarray(t.column("ts").cast(pa.timestamp("us"))
                          .cast(pa.int64())) // US_PER_WEEK
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        bounds = np.nonzero(new_user)[0]
        seg_len = np.diff(np.append(bounds, n))
        cohort_row = np.repeat(week[bounds], seg_len)  # first week
        offset = week - cohort_row                     # sorted ts: >=0
        # distinct (user, cohort, offset) then count per (cohort, off)
        key = np.stack([cohort_row, offset,
                        np.repeat(np.arange(len(bounds)), seg_len)], 1)
        uk = np.unique(key, axis=0)
        pair, cnt = np.unique(uk[:, :2], axis=0, return_counts=True)
        return pa.table({"cohort_week": pa.array(pair[:, 0]),
                         "week_offset": pa.array(pair[:, 1]),
                         "n_users": pa.array(cnt.astype(np.int64))},
                        schema=out_schema)

    from ray.data.aggregate import Sum
    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("ubucket") \
            .map_groups(retention, batch_format="pyarrow") \
            .groupby(["cohort_week", "week_offset"]) \
            .aggregate(Sum("n_users", alias_name="n_users"))
    t = _sorted_table(out, ["cohort_week", "week_offset"])
    return pa.table({
        "cohort_week": t.column("cohort_week").cast(pa.int64()),
        "week_offset": t.column("week_offset").cast(pa.int64()),
        "n_users": t.column("n_users").cast(pa.int64())})


# -- existence joins (semi / anti) -----------------------------------------

def customers_without_orders(sf_dir: str) -> pa.Table:
    """Customers with NO urgent orders, aggregated per market segment --
    the distributed ANTI join: same single co-partitioning shuffle as
    the inner ``hash_join``, per-partition Arrow "left anti" (correct
    because BOTH sides of a key land in the same partition, so absence
    in the partition == absence globally).  The right side is filtered
    AT THE READ (row-group predicate pushdown) and ships only its key
    column."""
    from ..stages.join import hash_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])
    okeys = read_clean(f"{sf_dir}/orders.parquet",
                       columns=["o_custkey", "o_orderpriority"],
                       filter=pc.field("o_orderpriority") == "1-URGENT") \
        .map_batches(lambda b: b.select(["o_custkey"]),
                     batch_format="pyarrow")
    j = hash_join(
        cust, okeys, on="c_custkey", right_on="o_custkey",
        join_type="left anti",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_mktsegment", pa.string()),
                               ("c_acctbal", pa.float64())]),
        right_schema=pa.schema([("o_custkey", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"c_mktsegment": b.column("c_mktsegment"),
                      "acctbal_cents": _cents(b.column("c_acctbal"))})
        out = t.group_by(["c_mktsegment"]).aggregate(
            [("acctbal_cents", "sum"), ("acctbal_cents", "count")])
        return out.rename_columns(
            ["c_mktsegment", "acctbal_cents", "n_customers"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("acctbal_cents", alias_name="acctbal_cents"),
            Sum("n_customers", alias_name="n_customers"))
    return small_table(agg, sort_keys=["c_mktsegment"],
                       int64_cols=["acctbal_cents", "n_customers"]) \
        .select(["c_mktsegment", "n_customers", "acctbal_cents"])


def parts_with_lineitems(sf_dir: str) -> pa.Table:
    """Parts that DO appear in lineitem, per brand -- the SEMI join
    twin of ``customers_without_orders``.  The many side (lineitem) is
    pre-deduplicated to its distinct keys INSIDE map_batches before the
    shuffle, so the exchange moves O(distinct keys), not O(rows)."""
    from ..stages.join import hash_join

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    lkeys = _read(sf_dir, "lineitem", ["l_partkey"]) \
        .map_batches(lambda b: b.group_by(["l_partkey"]).aggregate([]),
                     batch_format="pyarrow")
    j = hash_join(
        part, lkeys, on="p_partkey", right_on="l_partkey",
        join_type="left semi",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("p_brand", pa.string())]),
        right_schema=pa.schema([("l_partkey", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["p_brand"]).aggregate([("p_partkey", "count")])
        return out.rename_columns(["p_brand", "n_parts"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_brand").aggregate(Sum("n_parts", alias_name="n_parts"))
    return small_table(agg, sort_keys=["p_brand"], int64_cols=["n_parts"]) \
        .select(["p_brand", "n_parts"])


# -- three-table chained shuffle join -----------------------------------------

def customer_order_lineitem_join(sf_dir: str) -> pa.Table:
    """Revenue per market segment through lineitem JOIN orders JOIN
    customer -- two CHAINED co-partitioned shuffle joins (the first
    join's streamed output feeds the second's pad stage directly, no
    materialization between them; schemas thread explicitly so empty
    partitions can't poison inference).  The TPC-H Q3-shape without
    the broadcast shortcut: all three tables move through exchanges,
    the way a 100 TB fact-to-fact-to-dim chain must."""
    from ..stages.join import hash_join

    import os

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    est = 3 * sum(os.path.getsize(f"{sf_dir}/{t}.parquet")
                  for t in ("lineitem", "orders", "customer"))
    j1_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("l_extendedprice", pa.float64()),
                           ("l_discount", pa.float64()),
                           ("o_custkey", pa.int64())])
    j1 = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        est_bytes=est,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))
    j2 = hash_join(
        j1, cust, on="o_custkey", right_on="c_custkey",
        est_bytes=est,
        left_schema=pa.schema([("o_custkey", pa.int64())]
                              + list(j1_schema)[:3]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_mktsegment", pa.string())]))

    def partial(b: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))))
        t = pa.table({"c_mktsegment": b.column("c_mktsegment"),
                      "rev_cents": rev})
        out = t.group_by(["c_mktsegment"]).aggregate(
            [("rev_cents", "sum"), ("rev_cents", "count")])
        return out.rename_columns(["c_mktsegment", "rev_cents",
                                   "line_count"])

    agg = j2.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("line_count", alias_name="line_count"))
    return small_table(agg, sort_keys=["c_mktsegment"],
                       int64_cols=["rev_cents", "line_count"]) \
        .select(["c_mktsegment", "line_count", "rev_cents"])


# -- composite-key join --------------------------------------------------------

def orders_group_size_join(sf_dir: str) -> pa.Table:
    """Join orders to their own per-(custkey, status) group sizes on
    the COMPOSITE key -- exercises multi-column join keys end to end
    (hash fold for partitioning, all-column comparison in the
    per-partition Arrow join).  The group-size side is itself a
    distributed partial aggregate."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus", "o_totalprice"])

    def gpartial(b: pa.Table) -> pa.Table:
        out = b.group_by(["o_custkey", "o_orderstatus"]).aggregate(
            [("o_custkey", "count")])
        return out.rename_columns(["g_custkey", "g_status", "n_in_group"])

    sizes = orders.map_batches(gpartial, batch_format="pyarrow") \
        .groupby(["g_custkey", "g_status"]).aggregate(
            Sum("n_in_group", alias_name="n_in_group"))

    j = hash_join(
        orders, sizes, on=["o_custkey", "o_orderstatus"],
        right_on=["g_custkey", "g_status"],
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("o_orderstatus", pa.string()),
                               ("o_totalprice", pa.float64())]),
        right_schema=pa.schema([("g_custkey", pa.int64()),
                                ("g_status", pa.string()),
                                ("n_in_group", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderstatus": b.column("o_orderstatus"),
                      "n_in_group": b.column("n_in_group"),
                      "price_cents": _cents(b.column("o_totalprice"))})
        out = t.group_by(["o_orderstatus"]).aggregate(
            [("n_in_group", "sum"), ("price_cents", "sum"),
             ("price_cents", "count")])
        return out.rename_columns(["o_orderstatus", "sum_group_sizes",
                                   "price_cents", "n_orders"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            Sum("sum_group_sizes", alias_name="sum_group_sizes"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_orders", alias_name="n_orders"))
    return small_table(agg, sort_keys=["o_orderstatus"],
                       int64_cols=["sum_group_sizes", "price_cents",
                                   "n_orders"]) \
        .select(["o_orderstatus", "n_orders", "sum_group_sizes",
                 "price_cents"])


# -- outer joins -------------------------------------------------------------

def orders_customer_left_join(sf_dir: str) -> pa.Table:
    """Orders LEFT OUTER customer(AUTOMOBILE) -- null-extension on the
    big probe side.  Same single co-partitioning shuffle as the inner
    ``hash_join``; the per-partition Arrow "left outer" is globally
    correct because a key's rows from BOTH sides land in the same
    partition, so a left row unmatched in its partition is unmatched
    everywhere (null-extended exactly once).  The small side is
    filtered at the read and ships two columns."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_clean(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_acctbal", "c_mktsegment"],
                      filter=pc.field("c_mktsegment") == "AUTOMOBILE") \
        .map_batches(lambda b: b.select(["c_custkey", "c_acctbal"]),
                     batch_format="pyarrow")
    j = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        join_type="left outer",
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("o_totalprice", pa.float64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_acctbal", pa.float64())]))

    def partial(b: pa.Table) -> pa.Table:
        matched = pc.is_valid(b.column("c_acctbal"))
        t = pa.table({"matched": matched,
                      "price_cents": _cents(b.column("o_totalprice"))})
        out = t.group_by(["matched"]).aggregate(
            [("price_cents", "sum"), ("price_cents", "count")])
        return out.rename_columns(["matched", "price_cents", "n_orders"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("matched").aggregate(
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_orders", alias_name="n_orders"))
    return small_table(agg, sort_keys=["matched"],
                       int64_cols=["price_cents", "n_orders"]) \
        .select(["matched", "n_orders", "price_cents"])


def customer_order_full_join(sf_dir: str) -> pa.Table:
    """BUILDING customers FULL OUTER urgent orders -- unmatched rows
    survive on BOTH sides (left_only = BUILDING customers with no
    urgent order, right_only = urgent orders from non-BUILDING
    customers, both = matched pairs).  Arrow acero coalesces the key,
    so side attribution reads each side's non-key payload nullity.
    Distribution argument is the same co-partitioning invariant as the
    left join: global absence == partition-local absence."""
    from ..stages.join import hash_join

    cust = read_clean(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_acctbal", "c_mktsegment"],
                      filter=pc.field("c_mktsegment") == "BUILDING") \
        .map_batches(lambda b: b.select(["c_custkey", "c_acctbal"]),
                     batch_format="pyarrow")
    orders = read_clean(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
                        filter=pc.field("o_orderpriority") == "1-URGENT") \
        .map_batches(lambda b: b.select(["o_custkey", "o_totalprice"]),
                     batch_format="pyarrow")
    j = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey",
        join_type="full outer",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_acctbal", pa.float64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("o_totalprice", pa.float64())]))

    def partial(b: pa.Table) -> pa.Table:
        lv = pc.is_valid(b.column("c_acctbal"))
        rv = pc.is_valid(b.column("o_totalprice"))
        side = pc.if_else(pc.and_(lv, rv), pa.scalar("both"),
                          pc.if_else(lv, pa.scalar("left_only"),
                                     pa.scalar("right_only")))
        price = pc.fill_null(b.column("o_totalprice"), 0.0)
        t = pa.table({"side": side, "price_cents": _cents(price)})
        out = t.group_by(["side"]).aggregate(
            [("price_cents", "sum"), ("price_cents", "count")])
        return out.rename_columns(["side", "price_cents", "n_rows"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("side").aggregate(
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_rows", alias_name="n_rows"))
    return small_table(agg, sort_keys=["side"],
                       int64_cols=["price_cents", "n_rows"]) \
        .select(["side", "n_rows", "price_cents"])


# -- bloom-pruned semi join ---------------------------------------------------

def orders_bloom_semi_agg(sf_dir: str) -> pa.Table:
    """Orders from BUILDING-segment customers, per priority -- the
    exact semi join with a Bloom sideways pass (``stages/bloom.py``):
    the customer key set rides a ~1 MB bit array broadcast once, the
    orders side drops non-matching rows BEFORE the co-partitioning
    shuffle, and the exact per-partition semi join clears any false
    positives.  Same answer as an unfiltered semi join; the exchange
    moves matches + FPs only."""
    from ..stages.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderpriority", "o_totalprice"])
    cust = read_clean(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"],
                      filter=pc.field("c_mktsegment") == "BUILDING") \
        .map_batches(lambda b: b.select(["c_custkey"]),
                     batch_format="pyarrow")
    j = bloom_semi_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("o_orderpriority", pa.string()),
                               ("o_totalprice", pa.float64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": b.column("o_orderpriority"),
                      "price_cents": _cents(b.column("o_totalprice"))})
        out = t.group_by(["o_orderpriority"]).aggregate(
            [("price_cents", "sum"), ("price_cents", "count")])
        return out.rename_columns(["o_orderpriority", "price_cents",
                                   "n_orders"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_orders", alias_name="n_orders"))
    return small_table(agg, sort_keys=["o_orderpriority"],
                       int64_cols=["price_cents", "n_orders"]) \
        .select(["o_orderpriority", "n_orders", "price_cents"])


# -- retention cohorts ----------------------------------------------------------

def events_retention_cohorts(sf_dir: str) -> pa.Table:
    """Cohort retention: users grouped by first-seen DAY, active-user
    counts per (cohort_day, day_offset).  One user-bucket shuffle; the
    per-bucket kernel derives each user's first day AND their distinct
    active days in the same pass (sort + reduceat), emitting O(cohorts
    x offsets) partials -- the events never move twice."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])
    nb = _session_buckets()
    day_us = 86_400_000_000

    def add_cols(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(b.column("ts"), pa.int64()),
            pa.scalar(float(day_us)))), pa.int64())
        t = pa.table({"user_id": b.column("user_id"), "day": day})
        # per-batch distinct (user, day) collapse before the shuffle
        t = t.group_by(["user_id", "day"]).aggregate([])
        uid = np.asarray(t.column("user_id"))
        return t.append_column(
            "ubucket", pa.array((uid & (nb - 1)).astype(np.int32)))

    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("day_offset", pa.int64()),
                            ("n_users", pa.int64())])

    def cohorts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # distinct (user, day) within the bucket
        t = t.group_by(["user_id", "day"]).aggregate([])
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("day", "ascending")]))
        uid = np.asarray(t.column("user_id"))
        day = np.asarray(t.column("day"))
        new = np.empty(len(uid), dtype=bool)
        new[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new[1:])
        first = day[np.nonzero(new)[0]]           # per-user cohort day
        cohort = first[np.cumsum(new) - 1]        # broadcast to rows
        off = day - cohort
        key = pa.table({"cohort_day": pa.array(cohort),
                        "day_offset": pa.array(off)})
        out = key.group_by(["cohort_day", "day_offset"]).aggregate(
            [("day_offset", "count")])
        return out.rename_columns(
            ["cohort_day", "day_offset", "n_users"]).cast(out_schema)

    agg = ds.map_batches(add_cols, batch_format="pyarrow") \
        .groupby("ubucket").map_groups(cohorts, batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]).aggregate(
            Sum("n_users", alias_name="n_users"))
    return small_table(agg, sort_keys=["cohort_day", "day_offset"],
                       int64_cols=["cohort_day", "day_offset", "n_users"]) \
        .select(["cohort_day", "day_offset", "n_users"])


# -- one-pass column profiling --------------------------------------------------

def lineitem_profile_agg(sf_dir: str) -> pa.Table:
    """describe()-style per-column census of lineitem in ONE streaming
    pass (``stages/profile.py``): every batch emits one partial row
    per column, the shuffle is O(columns)."""
    from ..stages.profile import profile

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag"])
    out = profile(ds, numeric_cols=["l_quantity", "l_extendedprice",
                                    "l_discount", "l_tax"],
                  other_cols=["l_returnflag"])
    return small_table(out, sort_keys=["column"],
                       int64_cols=["n_rows", "n_nulls", "min_cents",
                                   "max_cents", "sum_cents"]) \
        .select(["column", "n_rows", "n_nulls", "min_cents", "max_cents",
                 "sum_cents"])


# -- gap-filled time-series resample -------------------------------------------

def events_resample_gapfill(sf_dir: str) -> pa.Table:
    """Hourly per-type event counts WITH empty hours zero-filled over
    each type's [min, max] hour span -- the time-series resample shape
    (dashboards and rate alerts need explicit zeros, not missing
    rows).  Distributed part is the usual O(hours x types) partial
    aggregate; gap-filling runs on that tiny result (never on rows),
    so the fill is free at any corpus size."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.cast(pc.floor(pc.divide(
            pc.cast(b.column("ts"), pa.int64()),
            pa.scalar(3_600_000_000.0))), pa.int64())
        t = pa.table({"event_type": b.column("event_type"), "hour": hour})
        out = t.group_by(["event_type", "hour"]).aggregate([("hour", "count")])
        return out.rename_columns(["event_type", "hour", "n_events"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n_events", alias_name="n_events"))
    t = small_table(agg, sort_keys=["event_type", "hour"],
                    int64_cols=["hour", "n_events"])
    # driver-side gap fill over the O(hours x types) result
    et = t.column("event_type").to_pylist()
    hr = np.asarray(t.column("hour"), dtype=np.int64)
    nv = np.asarray(t.column("n_events"), dtype=np.int64)
    out_t, out_h, out_n = [], [], []
    for typ in sorted(set(et)):
        sel = [i for i, e in enumerate(et) if e == typ]
        hours, counts = hr[sel], nv[sel]
        full = np.arange(hours.min(), hours.max() + 1)
        filled = np.zeros(len(full), dtype=np.int64)
        filled[hours - hours.min()] = counts
        out_t.extend([typ] * len(full))
        out_h.append(full)
        out_n.append(filled)
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "hour": pa.array(np.concatenate(out_h), pa.int64()),
                     "n_events": pa.array(np.concatenate(out_n), pa.int64())})


# -- declarative data-quality validation --------------------------------------

def orders_validate_agg(sf_dir: str) -> pa.Table:
    """Expectations-style constraint census over orders: null keys,
    status enum domain, price range, priority format -- one streaming
    pass, O(rules) shuffle (``stages/validate.py``)."""
    from ..stages.validate import (rule_in_set, rule_not_null, rule_range,
                                   rule_regex, validate)

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority"])
    rules = [rule_not_null("o_custkey"),
             rule_in_set("o_orderstatus", ["O", "F", "P"]),
             rule_range("o_totalprice", lo=0.0, hi=1_000_000.0),
             rule_regex("o_orderpriority", "^[1-5]-")]
    out = validate(ds, rules)
    return small_table(out, sort_keys=["rule"],
                       int64_cols=["n_violations", "n_rows"]) \
        .select(["rule", "n_violations", "n_rows"])


# -- CUBE / GROUPING SETS -----------------------------------------------------

def orders_cube_agg(sf_dir: str) -> pa.Table:
    """CUBE over (order year, status): all four grouping sets -- (yr,
    status), (yr), (status), () -- with count + exact-cents revenue,
    NULL marking each rolled-up dimension (ANSI GROUP BY CUBE output).

    Computed the way a distributed engine should: the fact table is
    shuffled ONCE, at the finest grain (per-batch partial aggregation,
    then one groupby) -- every coarser grouping set re-aggregates the
    O(years x statuses) finest-level partials, never re-reading or
    re-shuffling the fact table.  At 100 TB the cube costs exactly one
    corpus pass + one tiny exchange, regardless of how many grouping
    sets are requested (sum/count re-aggregate losslessly; avg would
    ride as sum+count, min/max as themselves)."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderstatus", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "yr": pc.cast(pc.year(b.column("o_orderdate")), pa.string()),
            "status": b.column("o_orderstatus"),
            "cents": _cents(b.column("o_totalprice"))})
        g = t.group_by(["yr", "status"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["yr", "status", "sum_cents", "n_orders"])

    fine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["yr", "status"]).aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_orders", alias_name="n_orders"))
    t = small_table(fine, int64_cols=["sum_cents", "n_orders"])

    def roll(keys: list[str]) -> pa.Table:
        if keys:
            g = t.group_by(keys).aggregate(
                [("sum_cents", "sum"), ("n_orders", "sum")])
            g = g.rename_columns(keys + ["sum_cents", "n_orders"])
        else:
            g = pa.table({
                "sum_cents": pa.array(
                    [pc.sum(t.column("sum_cents")).as_py()], pa.int64()),
                "n_orders": pa.array(
                    [pc.sum(t.column("n_orders")).as_py()], pa.int64())})
        for d in ("yr", "status"):
            if d not in keys:
                g = g.append_column(
                    d, pa.array([None] * g.num_rows, pa.string()))
        return g.select(["yr", "status", "n_orders", "sum_cents"])

    out = pa.concat_tables(
        [roll(["yr", "status"]), roll(["yr"]), roll(["status"]), roll([])])
    return out.take(pc.sort_indices(
        out, sort_keys=[("yr", "ascending"), ("status", "ascending")],
        null_placement="at_end"))


# -- dataset reconciliation diff ----------------------------------------------

def orders_diff_agg(sf_dir: str) -> pa.Table:
    """Key-level diff of two versions of the orders table (the "did
    the new pipeline change anything" check, ``stages/reconcile.py``):
    version B drops finished orders and bumps urgent prices by 1.00,
    so the diff must classify every key as left_only (dropped) /
    changed (bumped) / same -- one full-outer exchange, O(status)
    result."""
    from ..stages.reconcile import dataset_diff

    def ver_a(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "fp": _cents(b.column("o_totalprice"))})

    def ver_b(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b.column("o_orderstatus"), pa.scalar("F"))
        b = b.filter(keep)
        bump = pc.if_else(
            pc.equal(b.column("o_orderpriority"), pa.scalar("1-URGENT")),
            pa.scalar(100, pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "fp": pc.add(_cents(b.column("o_totalprice")),
                                      bump)})

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus",
            "o_orderpriority"]
    left = _read(sf_dir, "orders", cols).map_batches(
        ver_a, batch_format="pyarrow")
    right = _read(sf_dir, "orders", cols).map_batches(
        ver_b, batch_format="pyarrow")
    d = dataset_diff(left, right, on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"status": b.column("status"),
                      "k": b.column("o_orderkey")})
        out = t.group_by(["status"]).aggregate([("k", "count"), ("k", "sum")])
        return out.rename_columns(["status", "n_keys", "key_sum"])

    agg = d.map_batches(partial, batch_format="pyarrow") \
        .groupby("status").aggregate(
            Sum("n_keys", alias_name="n_keys"),
            Sum("key_sum", alias_name="key_sum"))
    return small_table(agg, sort_keys=["status"],
                       int64_cols=["n_keys", "key_sum"]) \
        .select(["status", "n_keys", "key_sum"])


# -- distributed total-order sort + global rank ------------------------------

def orders_global_rank(sf_dir: str) -> pa.Table:
    """Every order ranked by price descending -- the FULL ordered
    output with an exact global row number (``stages/sortrank.py``:
    range partitioning on sampled (key, id) boundaries, per-partition
    Arrow sort, rank = exclusive-prefix-sum offset + local position;
    the rank needs no driver pass and no all-to-all beyond the one
    range exchange).  DESC is expressed as ascending over negated
    cents, id-ascending tiebreak either way; rank is 1-based to match
    SQL row_number()."""
    from ..stages.sortrank import range_sort_rank

    import os
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("o_totalprice"))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "price_cents": cents,
                         "neg_cents": pc.negate_checked(cents)})

    est = 3 * os.path.getsize(f"{sf_dir}/orders.parquet")
    out = range_sort_rank(ds.map_batches(prep, batch_format="pyarrow"),
                          key="neg_cents", id_col="o_orderkey",
                          est_bytes=est)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "rank": pc.add(b.column("rank"), pa.scalar(1, pa.int64())),
            "o_orderkey": b.column("o_orderkey"),
            "price_cents": b.column("price_cents")})

    final = out.map_batches(finish, batch_format="pyarrow")
    return small_table(final, sort_keys=["rank"],
                       int64_cols=["rank", "price_cents"]) \
        .select(["rank", "o_orderkey", "price_cents"])


# -- grouped top-k ----------------------------------------------------------

def events_top_by_type(sf_dir: str) -> pa.Table:
    """Top-3 events per event_type by value -- distributed grouped
    top-k: each block contributes <= k rows per group (one vectorized
    sort + numpy rank per block), the shuffle moves only that reduced
    candidate set.  event_id is the unique tiebreak so results are
    deterministic."""
    from ..functions.tableops import grouped_topk

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    keys = [("value", "descending"), ("event_id", "ascending")]
    out = grouped_topk(ds, ["event_type"], 3, keys)
    t = small_table(out, sort_keys=["event_type", "event_id"])
    return pa.table({
        "event_type": t.column("event_type"),
        "event_id": t.column("event_id").cast(pa.int64()),
        "value_cents": _cents(t.column("value"))})


# -- exact quantiles --------------------------------------------------------

def doc_length_quantiles(sf_dir: str) -> pa.Table:
    """EXACT discrete quantiles of document length: the shuffle moves
    one row per DISTINCT length (value-counts pre-aggregate), the
    cumulative fold is O(distinct) on the driver.  Matches DuckDB
    quantile_disc bit-exactly (no float interpolation)."""
    from ..functions.tableops import exact_quantiles

    ds = _read(sf_dir, "documents", ["n_chars"])
    return exact_quantiles(ds, "n_chars",
                           [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def doc_length_quantiles_by_lang(sf_dir: str) -> pa.Table:
    """Per-language exact length quantiles -- one (lang, n_chars)
    value-counts shuffle, vectorized run-length fold per group."""
    from ..functions.tableops import grouped_exact_quantiles

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_exact_quantiles(ds, "lang", "n_chars",
                                   [0.25, 0.5, 0.75, 0.9])


# -- deterministic sampling / splitting -------------------------------------

def doc_hash_sample_agg(sf_dir: str, fraction: float = 0.1,
                        seed: int = 7) -> pa.Table:
    """Per-language accounting of a deterministic 10% document sample.
    The sample decision is a pure per-row md5-bucket test (see
    stages/sampling.py): shuffle-free, repartition-stable, and
    reproducible bit-exactly in SQL, which is what makes this oracle
    possible at all -- a random sample could only be rows-checked."""
    from ray.data.aggregate import Count

    from ..stages.sampling import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    s = hash_sample(ds, "doc_id", fraction, seed)

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["lang"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return out.rename_columns(["lang", "sum_chars", "n_docs"])

    agg = s.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("sum_chars", alias_name="sum_chars"),
                                   Sum("n_docs", alias_name="n_docs"))
    return small_table(agg, sort_keys=["lang"],
                       int64_cols=["sum_chars", "n_docs"]) \
        .select(["lang", "n_docs", "sum_chars"])


def doc_split_counts(sf_dir: str, seed: int = 11) -> pa.Table:
    """Train/val/test accounting for the deterministic 80/10/10 hash
    split.  The same doc_id lands in the same split forever (no
    test-into-train leakage across runs or appends); the oracle embeds
    the SAME integer bucket thresholds the operator uses."""
    from ray.data.aggregate import Count

    from ..stages.sampling import hash_split

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    s = hash_split(ds, "doc_id",
                   {"train": 0.8, "val": 0.1, "test": 0.1}, seed)

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["split"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return out.rename_columns(["split", "sum_chars", "n_docs"])

    agg = s.map_batches(partial, batch_format="pyarrow") \
        .groupby("split").aggregate(Sum("sum_chars", alias_name="sum_chars"),
                                    Sum("n_docs", alias_name="n_docs"))
    return small_table(agg, sort_keys=["split"],
                       int64_cols=["sum_chars", "n_docs"]) \
        .select(["split", "n_docs", "sum_chars"])


# -- running window aggregate ----------------------------------------------

def events_user_running_value(sf_dir: str) -> Dataset:
    """Per-event running total of value (cents) per user, ordered by
    (ts, event_id) -- the SQL window function ``SUM() OVER (PARTITION BY
    user ORDER BY ts)`` as a distributed operator.  Same shape as
    sessionization: shuffle once on a coarse cluster-scaled user bucket,
    then ONE Arrow sort + numpy cumsum-with-group-reset pass per bucket;
    blocks stay Arrow and the result streams out as a Dataset (it is
    O(input) rows -- never collected on the driver)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    nb = _session_buckets()

    def add_cols(b: pa.Table) -> pa.Table:
        b = b.append_column("cents", _cents(b.column("value")))
        b = b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))
        return b.select(["event_id", "ts", "user_id", "cents", "ubucket"])

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("running_cents", pa.int64())])

    def running(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = np.asarray(t.column("user_id"))
        cents = np.asarray(t.column("cents"))
        n = len(uid)
        cum = np.cumsum(cents)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        starts = np.nonzero(new_user)[0]
        base = np.where(starts > 0, cum[starts - 1], 0)
        run = cum - base[np.cumsum(new_user) - 1]
        return pa.table({"event_id": np.asarray(t.column("event_id")),
                         "user_id": uid,
                         "running_cents": run}, schema=out_schema)

    return ds.map_batches(add_cols, batch_format="pyarrow") \
        .groupby("ubucket").map_groups(running, batch_format="pyarrow")


def events_user_first_last(sf_dir: str) -> Dataset:
    """FIRST_VALUE/LAST_VALUE per user (ordered by ts, event_id):
    each batch collapses to AT MOST one candidate row per user
    (vectorized sort + boundary walk), so the shuffle moves O(users x
    batches-touching-that-user), never O(events); the per-bucket merge
    replays the same argmin/argmax rule over candidates.  Output is
    O(users) and streams out as a Dataset."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    nb = _session_buckets()

    part_schema = pa.schema([
        ("user_id", pa.int64()), ("ubucket", pa.int32()),
        ("first_ts", pa.int64()), ("first_event_id", pa.int64()),
        ("first_cents", pa.int64()),
        ("last_ts", pa.int64()), ("last_event_id", pa.int64()),
        ("last_cents", pa.int64()), ("n_events", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        t = pa.table({"user_id": b.column("user_id"),
                      "ts": pc.cast(b.column("ts"), pa.int64()),
                      "event_id": b.column("event_id"),
                      "cents": _cents(b.column("value"))})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = np.asarray(t.column("user_id"))
        new = np.empty(len(uid), dtype=bool)
        new[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new[1:])
        starts = np.nonzero(new)[0]
        ends = np.concatenate((starts[1:], [len(uid)])) - 1
        ts = np.asarray(t.column("ts"))
        eid = np.asarray(t.column("event_id"))
        cents = np.asarray(t.column("cents"))
        users = uid[starts]
        return pa.table({
            "user_id": users,
            "ubucket": (users & (nb - 1)).astype(np.int32),
            "first_ts": ts[starts], "first_event_id": eid[starts],
            "first_cents": cents[starts],
            "last_ts": ts[ends], "last_event_id": eid[ends],
            "last_cents": cents[ends],
            "n_events": (ends - starts + 1).astype(np.int64)},
            schema=part_schema)

    out_schema = pa.schema([
        ("user_id", pa.int64()),
        ("first_event_id", pa.int64()), ("first_cents", pa.int64()),
        ("last_event_id", pa.int64()), ("last_cents", pa.int64()),
        ("n_events", pa.int64())])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # min candidate by (first_ts, first_event_id) per user
        tf = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"),
                          ("first_ts", "ascending"),
                          ("first_event_id", "ascending")]))
        uid = np.asarray(tf.column("user_id"))
        new = np.empty(len(uid), dtype=bool)
        new[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new[1:])
        starts = np.nonzero(new)[0]
        n_events = np.add.reduceat(np.asarray(tf.column("n_events")), starts)
        first_eid = np.asarray(tf.column("first_event_id"))[starts]
        first_cents = np.asarray(tf.column("first_cents"))[starts]
        # max candidate by (last_ts, last_event_id) per user
        tl = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"),
                          ("last_ts", "ascending"),
                          ("last_event_id", "ascending")]))
        uidl = np.asarray(tl.column("user_id"))
        newl = np.empty(len(uidl), dtype=bool)
        newl[0] = True
        np.not_equal(uidl[1:], uidl[:-1], out=newl[1:])
        ends = np.concatenate((np.nonzero(newl)[0][1:], [len(uidl)])) - 1
        return pa.table({
            "user_id": uid[starts],
            "first_event_id": first_eid, "first_cents": first_cents,
            "last_event_id": np.asarray(tl.column("last_event_id"))[ends],
            "last_cents": np.asarray(tl.column("last_cents"))[ends],
            "n_events": n_events}, schema=out_schema)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("ubucket").map_groups(merge, batch_format="pyarrow")


# -- rollup aggregate --------------------------------------------------------

def lineitem_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(returnflag, linestatus): the leaf level is the
    only distributed work (partial pre-agg inside map_batches, one tiny
    groupby shuffle); the coarser levels are derived by re-aggregating
    the O(groups) leaf table on the driver -- rollup never needs a
    second pass over the data."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("qty_cents", _cents(b.column("l_quantity")))
        out = b.select(["l_returnflag", "l_linestatus", "qty_cents"]) \
            .group_by(["l_returnflag", "l_linestatus"]) \
            .aggregate([("qty_cents", "sum"), ("qty_cents", "count")])
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_cents", "row_count"])

    leaf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("row_count", alias_name="row_count"))
    t = small_table(leaf, sort_keys=["l_returnflag", "l_linestatus"],
                    int64_cols=["sum_qty_cents", "row_count"]) \
        .select(["l_returnflag", "l_linestatus", "sum_qty_cents", "row_count"])

    lvl1 = t.group_by(["l_returnflag"]).aggregate(
        [("sum_qty_cents", "sum"), ("row_count", "sum")])
    lvl1 = pa.table({
        "l_returnflag": lvl1.column("l_returnflag"),
        "l_linestatus": pa.nulls(lvl1.num_rows, pa.string()),
        "sum_qty_cents": lvl1.column("sum_qty_cents_sum"),
        "row_count": lvl1.column("row_count_sum")})
    total = pa.table({
        "l_returnflag": pa.nulls(1, pa.string()),
        "l_linestatus": pa.nulls(1, pa.string()),
        "sum_qty_cents": pa.array(
            [pc.sum(t.column("sum_qty_cents")).as_py() or 0], pa.int64()),
        "row_count": pa.array(
            [pc.sum(t.column("row_count")).as_py() or 0], pa.int64())})
    return pa.concat_tables([t, lvl1, total])


def doc_mixture_sample_agg(sf_dir: str, seed: int = 13) -> pa.Table:
    """Per-language accounting of a stratified mixture resample
    (per-group rates, e.g. downsample dominant English, keep all
    German, near-drop unlisted languages) -- the corpus-mixing
    operator every training-data pipeline ends with.  Deterministic
    md5 buckets, so value-hash oracle-checkable like the flat sample."""
    from ..stages.sampling import stratified_hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    s = stratified_hash_sample(ds, "doc_id", "lang",
                               {"en": 0.25, "zh": 0.8, "de": 1.0},
                               default=0.05, seed=seed)

    def partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["lang"]).aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return out.rename_columns(["lang", "sum_chars", "n_docs"])

    agg = s.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("sum_chars", alias_name="sum_chars"),
                                   Sum("n_docs", alias_name="n_docs"))
    return small_table(agg, sort_keys=["lang"],
                       int64_cols=["sum_chars", "n_docs"]) \
        .select(["lang", "n_docs", "sum_chars"])


# -- lag/lead window (event-to-event delta) ---------------------------------

def events_user_value_delta(sf_dir: str) -> Dataset:
    """Per-event change in value (cents) vs the user's PREVIOUS event --
    SQL's ``x - LAG(x) OVER (PARTITION BY user ORDER BY ts)`` as a
    distributed operator (null for each user's first event).  Same
    partitioning contract as the running-sum window: ONE shuffle on a
    coarse cluster-scaled user bucket, then one Arrow sort + numpy diff
    per bucket; blocks stay Arrow and the O(input) result streams out as
    a Dataset."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    nb = _session_buckets()

    def add_cols(b: pa.Table) -> pa.Table:
        b = b.append_column("cents", _cents(b.column("value")))
        b = b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))
        return b.select(["event_id", "ts", "user_id", "cents", "ubucket"])

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("delta_cents", pa.int64())])

    def delta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = np.asarray(t.column("user_id"))
        cents = np.asarray(t.column("cents"))
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        d = np.empty(n, dtype=np.int64)
        d[0] = 0
        np.subtract(cents[1:], cents[:-1], out=d[1:])
        return pa.table({"event_id": np.asarray(t.column("event_id")),
                         "user_id": uid,
                         "delta_cents": pa.array(d, mask=new_user)},
                        schema=out_schema)

    return ds.map_batches(add_cols, batch_format="pyarrow") \
        .groupby("ubucket").map_groups(delta, batch_format="pyarrow")


# -- ordered grouped collect (string_agg) -----------------------------------

def events_user_path(sf_dir: str) -> Dataset:
    """Per-user ordered event-type path ("view>click>purchase") -- the
    order-sensitive grouped collect (SQL ``string_agg(x, '>' ORDER BY
    ts)``), the clickstream/funnel primitive.  One coarse user-bucket
    shuffle, then per bucket: one Arrow sort, numpy boundary detection,
    and a zero-copy ``ListArray.from_arrays`` + ``pc.binary_join`` --
    the join over each user's slice is a single C kernel call, no
    per-user Python.  O(users) result streams out as a Dataset."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    nb = _session_buckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)), pa.int32()))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("path", pa.string()),
                            ("n_events", pa.int64())])

    def paths(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        uid = np.asarray(t.column("user_id"))
        n = len(uid)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        bounds = np.nonzero(new_user)[0]
        # ListArray offsets: [b0, ..., n]; b0 == 0 since new_user[0] is True
        offsets = np.append(bounds, n).astype(np.int32)
        vals = t.column("event_type").combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                         vals)
        joined = pc.binary_join(lists, ">")
        return pa.table({"user_id": pa.array(uid[bounds]),
                         "path": joined,
                         "n_events": pa.array(np.diff(
                             np.append(bounds, n)).astype(np.int64))},
                        schema=out_schema)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("ubucket").map_groups(paths, batch_format="pyarrow")


# -- pivot (long -> wide conditional aggregate) ------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_hour_type_pivot(sf_dir: str) -> pa.Table:
    """Events pivoted long->wide: one row per hour-of-day, one count
    column per event type (SQL ``SUM(CASE WHEN type='x' ...)``).  The
    pivot is computed as a per-batch bincount over ``hour * T + type``
    (each batch collapses to <= 24 rows BEFORE the shuffle), then a tiny
    24-row groupby-sum -- the shuffle moves O(hours x types), never
    O(rows), no matter the corpus size."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    tcodes = {t: i for i, t in enumerate(_EVENT_TYPES)}
    T = len(_EVENT_TYPES)
    ncols = [f"n_{t}" for t in _EVENT_TYPES]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hour": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64()) for c in ncols}})
        hour = np.asarray(pc.hour(b.column("ts")), dtype=np.int64)
        # index_in yields null for any type outside _EVENT_TYPES; a
        # null->NaN int cast would poison bincount, so route unknowns
        # (and null types) to a reject code and mask them out -- one
        # surprise enum value must not kill the whole pivot job.
        code = np.asarray(pc.fill_null(
            pc.index_in(b.column("event_type"),
                        value_set=pa.array(_EVENT_TYPES)), T),
            dtype=np.int64)
        known = code < T
        counts = np.bincount(hour[known] * T + code[known],
                             minlength=24 * T).reshape(24, T)
        nz = np.nonzero(counts.sum(axis=1))[0]
        return pa.table({"hour": pa.array(nz, type=pa.int64()),
                         **{c: pa.array(counts[nz, i], type=pa.int64())
                            for i, c in enumerate(ncols)}})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour").aggregate(
            *[Sum(c, alias_name=c) for c in ncols])
    return small_table(agg, sort_keys=["hour"], int64_cols=["hour"] + ncols) \
        .select(["hour"] + ncols)


# -- skew-defused shuffle join ----------------------------------------------

def order_lineitem_skew_join(sf_dir: str) -> pa.Table:
    """Same join as ``order_lineitem_join`` but via ``skew_join`` with a
    deterministic forced hot-key set, so BOTH execution paths -- the
    broadcast hot path and the co-partitioned cold path -- carry real
    rows and the union must still reproduce the SQL inner join exactly.
    (TPC-H-style orderkeys are not naturally skewed; at 100 TB the hot
    set would come from ``detect_hot_keys``, whose misses only cost
    speed, never rows.)"""
    from ..stages.join import skew_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    hot = [int(k) for k in range(1, 2000, 7)]      # forced, deterministic
    j = skew_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        hot_keys=hot,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_extendedprice", pa.float64()),
                               ("l_discount", pa.float64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderstatus", pa.string())]))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_orderstatus": pa.array([], pa.string()),
                             "rev_cents": pa.array([], pa.int64()),
                             "line_count": pa.array([], pa.int64())})
        rev = _cents(pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount"))))
        t = pa.table({"o_orderstatus": b.column("o_orderstatus"),
                      "rev_cents": rev})
        out = t.group_by(["o_orderstatus"]).aggregate(
            [("rev_cents", "sum"), ("rev_cents", "count")])
        return out.rename_columns(["o_orderstatus", "rev_cents",
                                   "line_count"])

    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("line_count", alias_name="line_count"))
    return small_table(agg, sort_keys=["o_orderstatus"],
                       int64_cols=["rev_cents", "line_count"]) \
        .select(["o_orderstatus", "rev_cents", "line_count"])


# -- cube aggregate ----------------------------------------------------------

def lineitem_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(returnflag, linestatus): like rollup, the leaf
    level is the ONLY distributed pass; all 2^2 grouping sets are
    derived by re-aggregating the O(groups) leaf table on the driver."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("qty_cents", _cents(b.column("l_quantity")))
        out = b.select(["l_returnflag", "l_linestatus", "qty_cents"]) \
            .group_by(["l_returnflag", "l_linestatus"]) \
            .aggregate([("qty_cents", "sum"), ("qty_cents", "count")])
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_cents", "row_count"])

    leaf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("row_count", alias_name="row_count"))
    t = small_table(leaf, sort_keys=["l_returnflag", "l_linestatus"],
                    int64_cols=["sum_qty_cents", "row_count"]) \
        .select(["l_returnflag", "l_linestatus", "sum_qty_cents",
                 "row_count"])

    def coarse(keys: list[str]) -> pa.Table:
        if keys:
            g = t.group_by(keys).aggregate(
                [("sum_qty_cents", "sum"), ("row_count", "sum")])
            cols = {}
            for c in ("l_returnflag", "l_linestatus"):
                cols[c] = (g.column(c) if c in keys
                           else pa.nulls(g.num_rows, pa.string()))
            cols["sum_qty_cents"] = g.column("sum_qty_cents_sum")
            cols["row_count"] = g.column("row_count_sum")
            return pa.table(cols)
        return pa.table({
            "l_returnflag": pa.nulls(1, pa.string()),
            "l_linestatus": pa.nulls(1, pa.string()),
            "sum_qty_cents": pa.array(
                [pc.sum(t.column("sum_qty_cents")).as_py() or 0], pa.int64()),
            "row_count": pa.array(
                [pc.sum(t.column("row_count")).as_py() or 0], pa.int64())})

    return pa.concat_tables(
        [t, coarse(["l_returnflag"]), coarse(["l_linestatus"]), coarse([])])


# -- unpivot / melt ----------------------------------------------------------

_MELT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount")


def lineitem_unpivot_agg(sf_dir: str) -> pa.Table:
    """UNPIVOT the three lineitem measures into (measure, value) long
    form, then aggregate per (returnflag, measure) -- the melt is a
    per-batch column stack (3 zero-copy column selects + concat, no
    row loops), and the long form NEVER materializes globally: each
    batch pre-aggregates before the tiny groupby shuffle."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", *_MELT_MEASURES])

    def partial(b: pa.Table) -> pa.Table:
        longs = []
        for m in _MELT_MEASURES:
            longs.append(pa.table({
                "l_returnflag": b.column("l_returnflag"),
                "measure": pa.array([m] * b.num_rows, pa.string()),
                "val_cents": _cents(b.column(m))}))
        long_t = pa.concat_tables(longs)
        out = long_t.group_by(["l_returnflag", "measure"]).aggregate(
            [("val_cents", "sum"), ("val_cents", "count")])
        return out.rename_columns(
            ["l_returnflag", "measure", "sum_cents", "n_rows"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "measure"]).aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_rows", alias_name="n_rows"))
    return small_table(agg, sort_keys=["l_returnflag", "measure"],
                       int64_cols=["sum_cents", "n_rows"]) \
        .select(["l_returnflag", "measure", "sum_cents", "n_rows"])


# -- quantile bucketing (NTILE-by-value) ------------------------------------

def events_value_quartile_agg(sf_dir: str) -> pa.Table:
    """Bucket every event by which QUARTILE of the global value
    distribution it falls in, then aggregate per bucket -- the
    feature-binning primitive.  Two bounded passes: (1) exact
    distributed quantiles for the 3 thresholds (value-counts shuffle,
    bit-exact with DuckDB quantile_disc -- proven by
    test_exact_quantiles_match_duckdb); (2) broadcast the 3 thresholds,
    one searchsorted per batch, partial pre-agg, tiny groupby."""
    from ..functions.tableops import exact_quantiles

    ds = _read(sf_dir, "events", ["value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(b.column("value"))})

    cents_ds = ds.map_batches(to_cents, batch_format="pyarrow")
    th = exact_quantiles(cents_ds, "cents", [0.25, 0.5, 0.75]) \
        .column("cents").to_pylist()
    th_np = np.asarray(th, dtype=np.int64)
    labels = pa.array(["q1", "q2", "q3", "q4"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_cents": pa.array([], pa.int64())})
        cents = np.asarray(b.column("cents"))
        idx = np.searchsorted(th_np, cents, side="left")
        cnt = np.bincount(idx, minlength=4)
        # integer segment sums (bincount weights= would round-trip
        # through float64): stable sort by bucket, one add.reduceat
        order = np.argsort(idx, kind="stable")
        s_idx, s_c = idx[order], cents[order]
        bounds = np.searchsorted(s_idx, np.arange(4))
        sums = np.add.reduceat(np.append(s_c, 0), np.append(bounds, len(s_c)))[:4]
        sums[cnt == 0] = 0
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": labels.take(pa.array(nz, pa.int64())),
                         "n_events": pa.array(cnt[nz], pa.int64()),
                         "sum_cents": pa.array(sums[nz], pa.int64())})

    agg = cents_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_cents", alias_name="sum_cents"))
    return small_table(agg, sort_keys=["bucket"],
                       int64_cols=["n_events", "sum_cents"]) \
        .select(["bucket", "n_events", "sum_cents"])


# -- conversion funnel --------------------------------------------------------

def events_funnel_agg(sf_dir: str) -> pa.Table:
    """Click->purchase conversion funnel, grouped by the hour of each
    user's FIRST click: users who clicked, and how many of them later
    purchased (first purchase strictly after first click).

    Distributed shape: batches collapse to per-user (min click ts, min
    purchase ts) partials BEFORE the user shuffle (the shuffle moves
    <= one 24-byte row per distinct user per batch, never events);
    groupby(user) folds the mins; a second partial collapses users to
    <= 24 hour rows before the tiny final groupby.  No sort, no join,
    nothing O(events) past the first map."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    part_schema = pa.schema([("user_id", pa.int64()),
                             ("click_us", pa.int64()),
                             ("pur_us", pa.int64())])

    def per_user_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("event_type"),
                              value_set=pa.array(["click", "purchase"])))
        if t.num_rows == 0:
            return part_schema.empty_table()
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        is_click = pc.equal(t.column("event_type"), "click")
        g = pa.table({
            "user_id": t.column("user_id"),
            "click_us": pc.if_else(is_click, us, pa.scalar(None, pa.int64())),
            "pur_us": pc.if_else(is_click, pa.scalar(None, pa.int64()), us),
        }).group_by(["user_id"]).aggregate(
            [("click_us", "min"), ("pur_us", "min")])
        return g.rename_columns(["user_id", "click_us", "pur_us"])

    per_user = ds.map_batches(per_user_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("click_us", alias_name="click_us"),
            Min("pur_us", alias_name="pur_us"))

    hour_schema = pa.schema([("click_hour", pa.int64()),
                             ("users_clicked", pa.int64()),
                             ("users_converted", pa.int64())])

    def per_hour_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("click_us")))
        if b.num_rows == 0:
            return hour_schema.empty_table()
        click = np.asarray(b.column("click_us"))
        hour = (click // 3_600_000_000) % 24
        pur = b.column("pur_us")
        conv = (pc.fill_null(pur, np.iinfo(np.int64).min).to_numpy(
            zero_copy_only=False) > click).astype(np.int64)
        # note: a purchase at/before the first click does NOT convert
        clicked = np.bincount(hour, minlength=24)
        converted = np.bincount(hour, weights=conv, minlength=24) \
            .astype(np.int64)
        nz = np.nonzero(clicked)[0]
        return pa.table({"click_hour": pa.array(nz, pa.int64()),
                         "users_clicked": pa.array(clicked[nz], pa.int64()),
                         "users_converted": pa.array(converted[nz],
                                                     pa.int64())})

    agg = per_user.map_batches(per_hour_partial, batch_format="pyarrow") \
        .groupby("click_hour").aggregate(
            Sum("users_clicked", alias_name="users_clicked"),
            Sum("users_converted", alias_name="users_converted"))
    return small_table(agg, sort_keys=["click_hour"],
                       int64_cols=["click_hour", "users_clicked",
                                   "users_converted"]) \
        .select(["click_hour", "users_clicked", "users_converted"])


def events_anomaly_mad(sf_dir: str) -> pa.Table:
    """Per-event-type robust anomaly screen: median / MAD of value
    cents and the count of rows beyond 5 MADs -- the telemetry-outlier
    analog of the reference's per-severity log triage.  One value-
    counts shuffle (row per distinct (type, cents)), exact integer
    fold on the driver (functions/tableops.grouped_mad_anomalies)."""
    from ..functions.tableops import grouped_mad_anomalies

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b.column("event_type")),
                       pc.is_valid(b.column("value")))
        b = b.filter(keep)
        return pa.table({"event_type": b.column("event_type"),
                         "cents": _cents(b.column("value"))})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    t = grouped_mad_anomalies(cents, "event_type", "cents", k_mad=5)
    idx = pc.sort_indices(t, sort_keys=[("event_type", "ascending")])
    return t.take(idx)


def events_dedup_window(sf_dir: str, window_s: int = 5) -> pa.Table:
    """Windowed event throttling -- the log-pipeline debounce: an event
    is KEPT iff it is the first of its (user, event_type) stream or
    arrives more than ``window_s`` after the PREVIOUS event of that
    stream (lag semantics; ties on ts collapse to one survivor).
    Same shape as sessionization: coarse user-bucket shuffle, one Arrow
    sort + numpy shift-compare per bucket, per-type aggregate out."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts"])
    win_us = np.int64(window_s) * 1_000_000
    nb = _session_buckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b.column("user_id")),
                               pc.is_valid(b.column("event_type"))),
                       pc.is_valid(b.column("ts")))
        b = b.filter(keep)
        return b.append_column(
            "ubucket", pc.cast(pc.bit_wise_and(b.column("user_id"),
                                               pa.scalar(nb - 1)),
                               pa.int32()))

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_kept", pa.int64()),
                            ("id_sum", pa.int64())])

    def throttle(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("event_type", "ascending"),
            ("ts", "ascending"), ("event_id", "ascending")])
        t = t.take(idx)
        uid = np.asarray(t.column("user_id"))
        ts = np.asarray(t.column("ts").cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        et = t.column("event_type").combine_chunks().dictionary_encode()
        etc = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = ((uid[1:] != uid[:-1]) | (etc[1:] != etc[:-1])
                    | ((ts[1:] - ts[:-1]) > win_us))
        kept = t.filter(pa.array(keep))
        # per-type partial: the groupby below folds across buckets
        g = pa.table({"event_type": kept.column("event_type"),
                      "n_kept": pa.array(
                          np.ones(kept.num_rows, dtype=np.int64)),
                      "id_sum": kept.column("event_id")}) \
            .group_by(["event_type"]) \
            .aggregate([("n_kept", "sum"), ("id_sum", "sum")])
        return g.rename_columns(["event_type", "n_kept", "id_sum"])

    from ray.data.aggregate import Sum
    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("ubucket").map_groups(throttle,
                                           batch_format="pyarrow") \
            .groupby("event_type") \
            .aggregate(Sum("n_kept", alias_name="n_kept"),
                       Sum("id_sum", alias_name="id_sum"))
    t = _sorted_table(out, ["event_type"])
    return t.select(["event_type", "n_kept", "id_sum"])


def events_chi2_type_hour(sf_dir: str) -> pa.Table:
    """Association screen between event_type and UTC hour-of-day --
    the drift/feature-selection primitive: exact-integer chi-squared
    over the 5 x 24 contingency table
    (functions/tableops.chi2_association -- one distinct-pair count
    shuffle, O(cells) driver fold)."""
    from ..functions.tableops import chi2_association

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b.column("event_type")),
                       pc.is_valid(b.column("ts")))
        b = b.filter(keep)
        us = np.asarray(b.column("ts").cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        hour = (us // 3_600_000_000) % 24
        return pa.table({"event_type": b.column("event_type"),
                         "hour": pa.array(hour, pa.int64())})

    return chi2_association(ds.map_batches(prep, batch_format="pyarrow"),
                            "event_type", "hour")


def events_type_anomaly(sf_dir: str, window: int = 6,
                        tau: int = 3) -> pa.Table:
    """Trailing-window traffic-anomaly detection per event type (the
    telemetry-pipeline alerting stage the reference's users run on top
    of per-sink counts; reference aggregates per sink only,
    src/commands/index.go:219-258 -- this is the next operator out).

    Per (event_type, hour) counts come from the usual per-batch
    combiner + one groupby; each type's DENSE hourly series (zeros for
    silent hours, over the global [hmin, hmax] range so drops are
    anomalies too) is then scanned per group inside ``map_groups`` with
    a numpy sliding window.  An hour is flagged when its count deviates
    from the trailing ``window`` prior hours by more than ``tau`` sigma
    -- evaluated in EXACT INTEGER arithmetic so the SQL oracle matches
    bit-for-bit:  (c*W - S)^2 > tau^2 * (W*Q - S^2)  where S, Q are the
    window's sum and sum-of-squares.  A zero-variance window flags any
    deviation (LHS > 0, RHS = 0), and equality (exactly tau sigma) does
    NOT flag -- same strictness both sides.

    Scale shape: the shuffle is O(types x hours) count partials; each
    group's dense series is O(hours) (a decade is ~90k rows) and groups
    spread across the cluster; only flagged rows return to the driver.
    Int64 exactness is guarded: counts are bounded so (c*W - S)^2 stays
    under 2^63 or the stage raises instead of wrapping."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        epoch_us = pc.cast(b.column("ts"), pa.int64())
        hour = pc.cast(pc.divide(epoch_us, pa.scalar(3_600_000_000)),
                       pa.int64())
        g = pa.table({"event_type": b.column("event_type"),
                      "h": hour}).group_by(["event_type", "h"])
        return g.aggregate([("h", "count")]).rename_columns(
            ["event_type", "h", "cnt"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "h"]).aggregate(
            Sum("cnt", alias_name="cnt")).materialize()
    from ray.data.aggregate import Max, Min
    bounds = counts.aggregate(Min("h"), Max("h"))
    h0, h1 = int(bounds["min(h)"]), int(bounds["max(h)"])
    n_hours = h1 - h0 + 1
    W, T2 = int(window), int(tau) * int(tau)

    def scan(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        dense = np.zeros(n_hours, np.int64)
        hs = group.column("h").to_numpy(zero_copy_only=False)
        cs = group.column("cnt").to_numpy(zero_copy_only=False)
        dense[hs - h0] = cs
        cmax = int(dense.max())
        # |c*W - S| <= cmax*W, squared must stay under 2^63
        if (cmax * W) ** 2 >= 1 << 63:
            raise OverflowError("events_type_anomaly: hourly counts too "
                                "large for exact int64 z^2; rescale")
        csum = np.concatenate(([0], np.cumsum(dense)))
        sq = np.concatenate(([0], np.cumsum(dense * dense)))
        # trailing window [i-W, i) for i >= W
        s = csum[W:-1] - csum[:-W - 1] if n_hours > W else np.empty(0, np.int64)
        q = sq[W:-1] - sq[:-W - 1] if n_hours > W else np.empty(0, np.int64)
        c = dense[W:]
        lhs = (c * W - s) ** 2
        rhs = T2 * (W * q - s * s)
        hit = lhs > rhs
        idx = np.nonzero(hit)[0]
        return pa.table({
            "event_type": pa.array([et] * len(idx), pa.string()),
            "hour_epoch": pa.array((idx + W + h0) * 3600, pa.int64()),
            "cnt": pa.array(c[idx], pa.int64()),
            "win_sum": pa.array(s[idx], pa.int64()),
            "win_sumsq": pa.array(q[idx], pa.int64()),
        })

    flagged = counts.groupby("event_type").map_groups(
        scan, batch_format="pyarrow")
    return _sorted_table(flagged, ["event_type", "hour_epoch"])
