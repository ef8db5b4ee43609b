"""Incremental exact dedup against a PERSISTED fingerprint snapshot.

A production corpus is not deduplicated once: every crawl increment
must be screened against everything already ingested.  Re-shuffling the
historical corpus per increment is the scale-killer (the snapshot side
is the 100 TB side); the standard fix is a persisted, hash-bucketed
fingerprint index:

* ``build_fingerprint_snapshot`` streams the corpus ONCE into
  ``fp_bucket=N/`` parquet of 64-bit content fingerprints (md5 prefix,
  so DuckDB reproduces it: ``('0x' || substr(md5(text), 1, 16))::
  UBIGINT``), idempotent via ``_SUCCESS`` like the reference's
  index-segment commits (src/unified_index/writer.go);
* ``incremental_dedup`` shuffles ONLY the increment (tiny by
  definition) by the same bucket function; each ``map_groups`` task
  reads its single snapshot bucket file and drops increment rows whose
  fingerprint already exists.  The snapshot never moves: per-increment
  I/O is O(increment + snapshot/num_buckets x touched_buckets), and a
  larger ``num_buckets`` bounds the per-task snapshot read.

Fingerprint equality is content equality up to 64-bit md5 collisions
(~1e-10 at 10^9 docs per bucket pair set); the SQL oracle uses the SAME
fingerprint, so the gate is bit-exact.  New docs whose text is NULL are
always kept (SQL NULL-membership semantics; asserted in the oracle).
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

NUM_FP_BUCKETS = 64


def fingerprints(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 content fingerprint per row: first 8 bytes of md5(text).
    Null texts get the sentinel 2^64-1 AND must be handled by the
    caller (a null is never equal to anything, including another null).
    Matches ``('0x' || substr(md5(text), 1, 16))::UBIGINT`` in DuckDB.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    md5 = hashlib.md5
    return np.array(
        [np.uint64(0xFFFFFFFFFFFFFFFF) if s is None
         else int.from_bytes(md5(s.encode()).digest()[:8], "big")
         for s in col.to_pylist()],
        dtype=np.uint64)


def build_fingerprint_snapshot(ds: Dataset, out_dir: str,
                               text_col: str = "text",
                               num_buckets: int = NUM_FP_BUCKETS) -> str:
    """ONE-TIME streaming build of the bucket-partitioned fingerprint
    snapshot; idempotent via ``_SUCCESS``."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir

    def partial(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        fp = fingerprints(t)
        valid = np.asarray(pc.is_valid(
            t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t))
        fp = np.unique(fp[valid])
        return pa.table({
            "fp": pa.array(fp.astype(np.int64)),
            "fp_bucket": pa.array(
                (fp & np.uint64(num_buckets - 1)).astype(np.int64))})

    ds.map_batches(partial, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["fp_bucket"])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _bucket_fps(snapshot_dir: str, bucket: int) -> np.ndarray:
    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(snapshot_dir, f"fp_bucket={bucket}",
                                   "*.parquet"))
    if not files:
        return np.zeros(0, dtype=np.uint64)
    parts = [pq.read_table(f, columns=["fp"]).column("fp")
             for f in files]
    return np.unique(np.asarray(pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts])).astype(np.uint64))


def incremental_dedup(new_ds: Dataset, snapshot_dir: str,
                      text_col: str = "text",
                      num_buckets: int = NUM_FP_BUCKETS) -> Dataset:
    """Rows of ``new_ds`` whose text fingerprint is NOT in the snapshot
    (null-text rows always kept).  Shuffles only the increment; reads
    each snapshot bucket at most once, inside the task that needs it."""

    def tag(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        fp = fingerprints(t)
        valid = np.asarray(pc.is_valid(
            t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t))
        bucket = np.where(valid, fp & np.uint64(num_buckets - 1),
                          np.uint64(num_buckets))  # null rows: own group
        return b.append_column("fp", pa.array(fp.astype(np.int64))) \
                .append_column("fp_bucket",
                               pa.array(bucket.astype(np.int64)))

    def screen(t: pa.Table) -> pa.Table:
        bucket = t.column("fp_bucket")[0].as_py()
        if bucket >= num_buckets:            # null-text group: keep all
            return t.drop_columns(["fp", "fp_bucket"])
        seen = _bucket_fps(snapshot_dir, bucket)
        fp = np.asarray(t.column("fp")).astype(np.uint64)
        keep = ~np.isin(fp, seen)
        return t.filter(pa.array(keep)).drop_columns(["fp", "fp_bucket"])

    return new_ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("fp_bucket").map_groups(screen, batch_format="pyarrow")
