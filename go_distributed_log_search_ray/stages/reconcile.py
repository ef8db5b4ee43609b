"""Dataset reconciliation: key-level diff of two Datasets.

The operational primitive behind "did the new pipeline version change
anything?" at 100 TB: fingerprint each side's payload per key, run ONE
co-partitioned full-outer exchange (both sides move once), and classify
every key as ``left_only`` / ``right_only`` / ``changed`` / ``same``.
Nothing lands on the driver; the output is a Dataset of (key, status)
that usually feeds a tiny status-count aggregate.

The caller supplies the fingerprint column (an int64 -- e.g. the value
itself for single-column payloads, or the first 16 hex chars of
md5(canonical row string) for wide rows, the same recipe
stages/incremental.py uses) so the diff rule is engine-portable and
SQL-reproducible.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def dataset_diff(left: Dataset, right: Dataset, on: str,
                 fp_col: str = "fp", right_on: str | None = None,
                 num_partitions: int | None = None,
                 est_bytes: int | None = None) -> Dataset:
    """Diff two keyed datasets by fingerprint.  Each side must carry
    exactly (key, fingerprint); duplicate keys within a side are the
    caller's bug (the join would fan out).  Returns (key, status)."""
    from .join import hash_join

    import pyarrow.compute as pc

    key_t = pa.int64()

    def prep(side: str, key_name: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({on: pc.cast(b.column(key_name), key_t),
                             f"fp_{side}": pc.cast(b.column(fp_col),
                                                   pa.int64())})
        return f

    l2 = left.map_batches(prep("l", on), batch_format="pyarrow")
    r2 = right.map_batches(prep("r", right_on or on),
                           batch_format="pyarrow")
    j = hash_join(
        l2, r2, on=on, join_type="full outer",
        num_partitions=num_partitions, est_bytes=est_bytes,
        left_schema=pa.schema([(on, key_t), ("fp_l", pa.int64())]),
        right_schema=pa.schema([(on, key_t), ("fp_r", pa.int64())]))

    out_schema = pa.schema([(on, key_t), ("status", pa.string())])

    def classify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        lv = pc.is_valid(b.column("fp_l"))
        rv = pc.is_valid(b.column("fp_r"))
        status = pc.if_else(
            pc.and_kleene(lv, rv),
            pc.if_else(pc.equal(b.column("fp_l"), b.column("fp_r")),
                       pa.scalar("same"), pa.scalar("changed")),
            pc.if_else(lv, pa.scalar("left_only"),
                       pa.scalar("right_only")))
        return pa.table({on: b.column(on),
                         "status": status.combine_chunks()
                         if isinstance(status, pa.ChunkedArray) else status},
                        schema=out_schema)

    return j.map_batches(classify, batch_format="pyarrow")
