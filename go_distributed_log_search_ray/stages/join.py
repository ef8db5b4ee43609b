"""Distributed hash join (shuffle join) for large x large tables.

The reference has no relational join (SURVEY 2.5: all its lookups are
broadcast-small-side), but a training-data engine needs one real
shuffle join; the broadcast pattern lives in ``stages/enrich.py`` and
``pipelines/relational.SegmentLookup``, this module is the co-partition
path for when NEITHER side fits in memory.

Why not ``ray.data.Dataset.join``: Ray 2.49's hash-join aggregator
builds an empty ZERO-COLUMN table for any partition that received no
rows on one side, and Arrow's acero join then fails with "No match ...
for key field on left side" -- tiny or skewed inputs hit this
constantly.  This implementation instead:

1. null-pads both sides to one shared schema + a ``__side`` tag,
2. unions them (ONE co-partitioning shuffle on the key hash -- the same
   data movement a textbook hash join performs),
3. per partition, splits the sides back apart (filtering preserves
   schemas, so empty sides are empty TYPED tables) and joins with
   Arrow's C++ hash join.

Payload caveat inherited from acero: non-key columns must not be
list-typed (encode vectors as binary -- see dedup._np_rows_to_binary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


from .partitions import num_partitions as _num_partitions  # noqa: F401



def _hash64(col: pa.Array) -> np.ndarray:
    """Mixed 64-bit hash of a key column: splitmix-style mix so
    sequential ids spread.  Strings hash via crc32 over the batch's
    dictionary (one hash per DISTINCT value)."""
    import zlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        h = np.asarray(col.cast(pa.int64())).astype(np.uint64)
    else:
        enc = col.cast(pa.string()).dictionary_encode()
        uh = np.array([zlib.crc32(t.encode()) for t in
                       enc.dictionary.to_pylist()], dtype=np.uint64)
        h = uh[np.asarray(enc.indices, dtype=np.int64)]
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h


def _part_of(col: pa.Array, p: int) -> pa.Array:
    """Partition id of a single key column, masked to p (power of two)."""
    return pa.array((_hash64(col) & np.uint64(p - 1)).astype(np.int32))


def _part_of_keys(t: pa.Table, keys: list[str], p: int) -> pa.Array:
    """Partition id over a COMPOSITE key: per-column mixed hashes fold
    with an FNV-style combine (order-sensitive, so (a, b) and (b, a)
    land independently).  Single-key calls reduce to ``_part_of``."""
    if len(keys) == 1:
        return _part_of(t.column(keys[0]), p)
    acc = None
    for k in keys:
        h = _hash64(t.column(k))
        acc = h if acc is None else \
            ((acc * np.uint64(0x100000001B3)) & np.uint64((1 << 64) - 1)) ^ h
    return pa.array((acc & np.uint64(p - 1)).astype(np.int32))


def _infer_schema(ds: Dataset, on: str) -> pa.Schema:
    wrapped = ds.schema()
    if wrapped is None:
        raise TypeError(
            "cannot infer a schema for an empty side; pass "
            "left_schema/right_schema explicitly")
    sch = wrapped.base_schema
    if not isinstance(sch, pa.Schema):
        raise TypeError(
            "cannot infer an Arrow schema for this side (pandas blocks?); "
            "pass left_schema/right_schema explicitly")
    bad = [f.name for f in sch if pa.types.is_null(f.type)]
    if bad or on not in sch.names:
        raise TypeError(
            f"degenerate inferred schema (null-typed {bad}, names "
            f"{sch.names}): Ray infers from the first block, and ZERO-ROW "
            "blocks (which bypass map_batches, so they can't be fixed "
            "up-stream) may carry no/null columns.  Pass "
            "left_schema/right_schema explicitly.")
    return sch


def hash_join(left: Dataset, right: Dataset, on: str | list[str],
              right_on: str | list[str] | None = None,
              num_partitions: int | None = None,
              join_type: str = "inner",
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              est_bytes: int | None = None) -> Dataset:
    """Co-partitioned shuffle join of two Datasets on one key or a
    COMPOSITE key (pass a list -- partitioning folds the per-column
    hashes, the per-partition Arrow join compares all columns, so
    composite semantics are exact, not hash-approximate).

    Both sides move once (the union shuffle); per-partition joins are
    Arrow C++ hash joins.  Output columns: key(s) + left non-key +
    right non-key (names must be disjoint).

    ``left_schema``/``right_schema``: pass these whenever the input may
    contain zero-row blocks (groupby/map_groups outputs) -- Ray infers a
    Dataset schema from its FIRST block, zero-row blocks bypass
    map_batches fix-ups entirely, and a degenerate first block would
    otherwise give the pad stage null-typed templates.

    Skew: a hot KEY's rows all land in one partition (correct but that
    partition's merge task holds them in memory).  ``num_partitions``
    bounds average partition size; for a known-hot key the standard
    mitigations apply upstream -- pre-aggregate the many-side per key
    before joining, or broadcast the rows of the hot keys separately
    (see stages/enrich.py) and join only the cold remainder.

    ``join_type``: any Arrow acero type -- "inner", "left outer",
    "left semi" / "left anti" (existence filters: output is the LEFT
    columns only, the right side contributes nothing but its key set),
    and their "right ..." mirrors."""
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if len(rkeys) != len(keys):
        raise ValueError("right_on must match the key count of on")
    on = keys[0]
    right_on = rkeys[0]
    # normalize to Arrow blocks (inputs may carry pandas blocks, e.g.
    # map_groups output, whose schema objects aren't pyarrow Schemas)
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    lsch: pa.Schema = left_schema or _infer_schema(left, on)
    rsch: pa.Schema = right_schema or _infer_schema(right, right_on)
    lcols = [n for n in lsch.names if n not in keys]
    rcols = [n for n in rsch.names if n not in rkeys]
    # existence joins emit one side only: the other side's payload
    # columns never reach the output, so don't ship them through the
    # shuffle at all (the pad stage nulls them anyway -- this just
    # drops the dead columns from the union schema)
    if join_type in ("left semi", "left anti"):
        rcols = []
    elif join_type in ("right semi", "right anti"):
        lcols = []
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"non-key column name clash: {sorted(clash)}")
    key_fields = [(k, lsch.field(k).type) for k in keys]
    key_type = key_fields[0][1]
    p = 1
    target = num_partitions or _num_partitions(est_bytes)
    while p < target:
        p *= 2
    order = keys + lcols + rcols + ["__side"]

    target = pa.schema(
        key_fields
        + [(n, lsch.field(n).type) for n in lcols]
        + [(n, rsch.field(n).type) for n in rcols]
        + [("__side", pa.int8()), ("__part", pa.int32())])
    empty_canonical = target.empty_table()

    def pad(side: int):
        other = ([(n, rsch.field(n).type) for n in rcols] if side == 0
                 else [(n, lsch.field(n).type) for n in lcols])

        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                # degenerate empty blocks (e.g. from upstream groupby
                # partitions) may have no/null columns; emit typed empty
                return empty_canonical
            if side == 1 and rkeys != keys:
                ren = dict(zip(rkeys, keys))
                b = b.rename_columns(
                    [ren.get(n, n) for n in b.column_names])
            # project to this side's shipped columns first: an existence
            # join drops the non-output side's payload, which may shadow
            # the padded names (e.g. a semi self-join)
            b = b.select(keys + (lcols if side == 0 else rcols))
            for name, typ in other:
                b = b.append_column(name, pa.nulls(b.num_rows, type=typ))
            b = b.append_column(
                "__side", pa.array(np.full(b.num_rows, side, dtype=np.int8)))
            b = b.append_column("__part", _part_of_keys(b, keys, p))
            return b.select(order + ["__part"]).cast(target)

        return f

    l2 = left.map_batches(pad(0), batch_format="pyarrow")
    r2 = right.map_batches(pad(1), batch_format="pyarrow")
    unioned = l2.union(r2)

    if join_type in ("left semi", "left anti"):
        out_cols = keys + lcols
    elif join_type in ("right semi", "right anti"):
        out_cols = keys + rcols
    else:
        out_cols = keys + lcols + rcols
    ktypes = dict(key_fields)
    out_schema = pa.schema(
        [(n, ktypes[n] if n in ktypes else
          (lsch.field(n).type if n in lcols else rsch.field(n).type))
         for n in out_cols])
    out_empty = out_schema.empty_table()

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return out_empty
        t = t.drop_columns(["__part"])
        side = t.column("__side")
        lt = t.filter(pc.equal(side, 0)).select(keys + lcols)
        rt = t.filter(pc.equal(side, 1)).select(keys + rcols)
        out = lt.join(rt, keys=keys, join_type=join_type)
        # acero column order is not deterministic; canonicalize
        return out.select(out_cols).cast(out_schema)

    def canon(t: pa.Table) -> pa.Table:
        # Ray's groupby emits ZERO-COLUMN blocks for empty partitions;
        # replace with a typed empty so chained joins / schema inference
        # never see a null-typed column
        return t if t.num_rows else out_empty

    return unioned.groupby("__part") \
        .map_groups(merge, batch_format="pyarrow") \
        .map_batches(canon, batch_format="pyarrow")


# -- skew-aware join ---------------------------------------------------------

def detect_hot_keys(ds: Dataset, on: str, threshold_frac: float = 0.01,
                    per_batch: int = 32) -> list:
    """Approximate heavy hitters of ``ds[on]``: each batch emits its own
    top-``per_batch`` (key, count) pairs (one vectorized value_counts),
    the tiny candidate set folds on the driver, and keys whose folded
    count is >= ``threshold_frac`` of the total row count are hot.

    This is a PERFORMANCE HINT, not a correctness input: a key that
    slips detection just takes the (correct, slower) co-partitioned
    path in ``skew_join``.  A key holding >= 1% of an entire dataset is
    top-32 of essentially every batch it appears in, so folded counts
    are near-exact for true heavy hitters."""
    import pyarrow.compute as pc

    total = ds.count()
    if total == 0:
        return []

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], b.column(on).type),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        vc = b.column(on).combine_chunks().value_counts()
        keys, cnts = vc.field("values"), vc.field("counts")
        if len(keys) > per_batch:
            idx = pc.sort_indices(pa.table({"c": cnts}),
                                  sort_keys=[("c", "descending")]) \
                .slice(0, per_batch)
            keys, cnts = keys.take(idx), cnts.take(idx)
        return pa.table({"key": keys, "cnt": pc.cast(cnts, pa.int64())})

    from ..functions.tableops import small_table
    cand = small_table(ds.map_batches(partial, batch_format="pyarrow"))
    if cand.num_rows == 0:
        return []
    fold = cand.group_by(["key"]).aggregate([("cnt", "sum")])
    cut = max(1, int(total * threshold_frac))
    hot = fold.filter(pc.greater_equal(fold.column("cnt_sum"), cut))
    return hot.column("key").to_pylist()


def skew_join(left: Dataset, right: Dataset, on: str,
              right_on: str | None = None,
              join_type: str = "inner",
              hot_keys: list | None = None,
              threshold_frac: float = 0.01,
              num_partitions: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              concurrency=(1, 8)) -> Dataset:
    """Skew-defused shuffle join: rows of HOT keys never enter the
    shuffle -- their right-side matches are broadcast once (``ray.put``)
    and joined per-batch on the left, so the hot key's rows stream
    through an embarrassingly-parallel map instead of piling into one
    partition's merge task.  Cold keys take the normal co-partitioned
    ``hash_join``.  Output = hot-path union cold-path (same rows as a
    plain join, any order).

    Assumes the RIGHT side has broadcastable row volume for the hot
    keys (the fact-skew/dimension-bounded case -- a hot key with huge
    volume on BOTH sides produces a quadratic output no partitioning
    can defuse).  ``join_type``: "inner" or "left outer"."""
    import ray
    import pyarrow.compute as pc

    if join_type not in ("inner", "left outer"):
        raise ValueError("skew_join supports inner / left outer")
    right_on = right_on or on
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    lsch: pa.Schema = left_schema or _infer_schema(left, on)
    rsch: pa.Schema = right_schema or _infer_schema(right, right_on)
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, on, threshold_frac)
    if not hot_keys:
        return hash_join(left, right, on, right_on,
                         num_partitions=num_partitions, join_type=join_type,
                         left_schema=lsch, right_schema=rsch)

    hot_arr = pa.array(hot_keys, type=lsch.field(on).type)
    rcols = [n for n in rsch.names if n != right_on]
    out_cols = [on] + [n for n in lsch.names if n != on] + rcols
    out_schema = pa.schema(
        [(n, lsch.field(n).type if n in lsch.names else rsch.field(n).type)
         for n in out_cols])
    out_empty = out_schema.empty_table()

    # broadcast the hot right rows (collected once; small by assumption)
    from ..functions.tableops import small_table
    rhot_ds = right.map_batches(
        lambda b: b.filter(pc.fill_null(
            pc.is_in(b.column(right_on), value_set=hot_arr), False))
        if b.num_rows else b,
        batch_format="pyarrow")
    rhot = small_table(rhot_ds)
    if right_on != on:
        rhot = rhot.rename_columns(
            [on if n == right_on else n for n in rhot.column_names])
    rhot_ref = ray.put(rhot)

    class HotJoin:
        def __init__(self, rtab):
            if isinstance(rtab, ray.ObjectRef):
                rtab = ray.get(rtab)
            self.rtab = rtab

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_empty
            mask = pc.fill_null(pc.is_in(b.column(on), value_set=hot_arr),
                                False)
            lh = b.filter(mask)
            if lh.num_rows == 0:
                return out_empty
            out = lh.join(self.rtab, keys=[on], join_type=join_type)
            return out.select(out_cols).cast(out_schema)

    hot_out = left.map_batches(
        HotJoin, fn_constructor_args=(rhot_ref,), batch_format="pyarrow",
        concurrency=concurrency)

    def drop_hot(col: str):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            return b.filter(pc.fill_null(
                pc.invert(pc.is_in(b.column(col), value_set=hot_arr)), True))
        return f

    cold = hash_join(
        left.map_batches(drop_hot(on), batch_format="pyarrow"),
        right.map_batches(drop_hot(right_on), batch_format="pyarrow"),
        on, right_on, num_partitions=num_partitions, join_type=join_type,
        left_schema=lsch, right_schema=rsch)
    cold = cold.map_batches(
        lambda b: b.select(out_cols).cast(out_schema) if b.num_rows
        else out_empty, batch_format="pyarrow")
    return hot_out.union(cold)
