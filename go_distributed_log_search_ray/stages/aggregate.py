"""Per-sink aggregation (reference A1: per-segment doc_count counted while
writing, src/commands/mod.go:314-351) as a shuffle-minimal groupby.

Two scale defenses, both explicit:

1. **Partial pre-aggregation**: each ``map_batches`` call collapses its
   batch to at most |lang|x|buckets| partial rows BEFORE the all-to-all
   ``groupby`` -- the shuffle moves O(keys) rows per block instead of
   O(rows).
2. **Salting**: for skewed keys (hot host domains -> hot
   (lang, host_bucket) sinks), ``salted_groupby_sum`` adds a salt column
   so the first-stage combine spreads one hot key over S reducers, then a
   tiny second groupby folds the salts.  With (1) the per-block fan-in is
   already tiny, but the salted path is kept for aggregations whose
   partials are NOT tiny (e.g. distinct-ish states) and is used by the
   flagship pipeline on the final fold to demonstrate the pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

SINK_KEYS = ["lang", "host_bucket"]


def partial_sink_counts(batch: pa.Table) -> pa.Table:
    """Batch -> tiny partial table (lang, host_bucket, doc_count, byte_count)."""
    g = batch.select(SINK_KEYS + ["text_bytes"]).group_by(SINK_KEYS)
    out = g.aggregate([("text_bytes", "count"), ("text_bytes", "sum")])
    out = out.rename_columns(SINK_KEYS + ["doc_count", "byte_count"])
    return pa.table({
        "lang": out.column("lang"),
        "host_bucket": out.column("host_bucket"),
        "doc_count": out.column("doc_count").cast(pa.int64()),
        "byte_count": out.column("byte_count").cast(pa.int64()),
    })


def sink_counts(ds: Dataset, salt: int = 0) -> Dataset:
    """Dataset with routed columns -> per-sink (doc_count, byte_count).

    map_batches partial combine, then a groupby over the tiny partials.
    ``salt`` > 0 inserts a salted first fold (see module docstring).
    """
    partials = ds.map_batches(partial_sink_counts, batch_format="pyarrow")
    if salt > 1:
        def add_salt(b: pa.Table) -> pa.Table:
            import numpy as np
            s = pa.array(np.arange(b.num_rows, dtype=np.int64) % salt)
            return b.append_column("salt", s)

        salted = partials.map_batches(add_salt, batch_format="pyarrow")
        first = salted.groupby(SINK_KEYS + ["salt"]).aggregate(
            Sum("doc_count", alias_name="doc_count"),
            Sum("byte_count", alias_name="byte_count"))
        partials = first.drop_columns(["salt"])
    return partials.groupby(SINK_KEYS).aggregate(
        Sum("doc_count", alias_name="doc_count"),
        Sum("byte_count", alias_name="byte_count"))


def sink_counts_table(ds: Dataset, salt: int = 0) -> pa.Table:
    from ..functions.tableops import small_table
    t = small_table(sink_counts(ds, salt=salt), sort_keys=SINK_KEYS,
                    int64_cols=["doc_count", "byte_count"])
    return t.select(SINK_KEYS + ["doc_count", "byte_count"])
