"""Small-result materialization helpers.

``small_table`` is the ONE sanctioned way to land a tiny Dataset result
(aggregate output, top-k fold) on the driver: ``take_all`` straight into
an Arrow table.  The previous ``ds.to_pandas() -> Table.from_pandas``
hop rewrote block schemas with pandas-specific metadata, which Ray's
reduce-task schema deduplication cannot hash ("Failed to hash the
schemas ... unhashable type: 'dict'" warning storm in benches) and paid
two extra copies.  Only ever call this on results that are small by
construction -- O(groups) or O(k x blocks) rows, never O(input).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def strip_meta(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata from a batch.  Parquet files written by
    pandas carry a ``b'pandas'`` schema metadata blob that makes
    ``hash(schema)`` raise (metadata is a dict), which Ray's reduce-task
    schema deduplication logs as a per-block warning storm.  Metadata-only
    op: the column buffers are untouched (zero-copy)."""
    return batch.replace_schema_metadata(None)


def read_clean(path: str, columns: list[str] | None = None, **kwargs) -> Dataset:
    """read_parquet + schema-metadata strip (see ``strip_meta``).

    The explicit metadata-free ``schema=`` reaches the scan fragments, so
    even the read tasks' own block-schema hashing stays clean; the
    ``strip_meta`` stage covers anything the scanner re-attaches."""
    import os
    import ray.data
    if "schema" not in kwargs and os.path.isfile(path):
        import pyarrow.parquet as pq
        sch = pq.read_schema(path).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        kwargs["schema"] = sch
    return ray.data.read_parquet(path, columns=columns, **kwargs) \
        .map_batches(strip_meta, batch_format="pyarrow")


def small_table(ds: Dataset, sort_keys: list[str] | None = None,
                int64_cols: list[str] | None = None) -> pa.Table:
    """Materialize a small Dataset as a pyarrow Table (no pandas hop).

    ``sort_keys``: ascending sort for deterministic output order.
    ``int64_cols``: columns cast to int64 (Ray aggregates sometimes
    widen/narrow counts; oracle comparison needs exact types).
    """
    rows = ds.take_all()
    if not rows:
        return pa.table({})
    t = pa.Table.from_pylist(rows)
    for c in int64_cols or []:
        i = t.column_names.index(c)
        t = t.set_column(i, c, t.column(c).cast(pa.int64()))
    if sort_keys:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in sort_keys]))
    return t


def batch_topk(batch: pa.Table, k: int, sort_keys: list[tuple[str, str]]) -> pa.Table:
    """Per-batch top-k by the given (col, order) keys -- the combine side
    of the distributed top-k pattern: each block contributes at most k
    candidate rows, so the global fold sees O(k x blocks) rows instead
    of an all-to-all sort of the full dataset."""
    order = pc.sort_indices(batch, sort_keys=sort_keys)
    return batch.take(order.slice(0, min(k, batch.num_rows)))


def global_topk(ds: Dataset, k: int, sort_keys: list[tuple[str, str]]) -> pa.Table:
    """Distributed exact top-k: per-batch combine, tiny driver fold."""
    cands = ds.map_batches(lambda b: batch_topk(b, k, sort_keys),
                           batch_format="pyarrow")
    t = small_table(cands)
    if t.num_rows == 0:
        return t
    return t.take(pc.sort_indices(t, sort_keys=sort_keys).slice(0, k))
