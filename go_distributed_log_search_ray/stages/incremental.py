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
import shutil

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
    # torn-write hygiene (see export.py): a redo over stale partials
    # would append a second full copy of every bucket.  The fp screen
    # itself is set-semantic (np.unique), so this is storage hygiene,
    # not a correctness hole -- but 2x snapshot bytes at 100 TB is real.
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

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


# -- incremental NEAR-dup screen vs a persisted LSH band snapshot -------------

def _band_sig_rows(b: pa.Table, id_col: str, text_col: str,
                   hasher, bands: int, num_buckets: int) -> pa.Table:
    """(bucket, band_key, id, sig) rows for one batch: band keys by the
    SAME fold as the batch path (stages/dedup.band_rows), signature
    bytes inline so the screen task can verify candidates locally."""
    from .dedup import _np_rows_to_binary, band_rows

    t = b.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    valid = np.asarray(pc.is_valid(t))
    b2 = b.filter(pa.array(valid))
    if b2.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "band_key": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "sig": pa.array([], pa.binary())})
    sigs = hasher.batch_signatures(
        b2.column(text_col).combine_chunks().cast(pa.binary())
        if isinstance(b2.column(text_col), pa.ChunkedArray)
        else b2.column(text_col).cast(pa.binary()))
    tmp = pa.table({id_col: b2.column(id_col),
                    "minhash": pa.array(list(sigs.astype(np.uint64)))})
    br = band_rows(tmp, num_perm=hasher.num_perm, bands=bands,
                   id_col=id_col)
    key = np.asarray(br.column("band_key")).astype(np.uint64)
    sig_col = _np_rows_to_binary(sigs)          # one sig per doc...
    sig_rep = sig_col.take(pa.array(
        np.repeat(np.arange(b2.num_rows, dtype=np.int64), bands)))
    return pa.table({
        "bucket": pa.array((key & np.uint64(num_buckets - 1))
                           .astype(np.int64)),
        "band_key": br.column("band_key"),
        id_col: br.column(id_col),
        "sig": sig_rep})


def build_band_snapshot(ds: Dataset, out_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_perm: int = 64, bands: int = 16,
                        num_buckets: int = NUM_FP_BUCKETS) -> str:
    """ONE-TIME streaming build of the bucket-partitioned LSH band
    index: (band_key, id, signature) postings under ``band_bucket=N/``,
    ``_SUCCESS``-idempotent like the fingerprint snapshot.  Signature
    bytes ride every band row (bands x 8 x num_perm bytes per doc) --
    the storage trade that lets an increment VERIFY candidates without
    touching any other bucket."""
    from .dedup import MinHasher

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    # torn-write hygiene: stale partials + a redo would double every
    # posting (inflating dup_hits counts, not just is_dup) and double
    # the snapshot bytes.  Rebuild from scratch.
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    class Exploder:
        def __init__(self) -> None:
            self.h = MinHasher(num_perm=num_perm)

        def __call__(self, b: pa.Table) -> pa.Table:
            return _band_sig_rows(b, id_col, text_col, self.h, bands,
                                  num_buckets)

    ds.map_batches(Exploder, batch_format="pyarrow",
                   concurrency=(1, 8)) \
      .write_parquet(out_dir, partition_cols=["bucket"])
    with open(marker, "w", encoding="utf-8") as f:
        f.write("ok")
    return out_dir


def _bucket_postings(snapshot_dir: str, bucket: int, id_col: str):
    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(snapshot_dir, f"bucket={bucket}",
                                   "*.parquet"))
    if not files:
        return None
    return pa.concat_tables(
        [pq.read_table(f, columns=["band_key", id_col, "sig"])
         for f in files])


def incremental_near_dedup(new_ds: Dataset, snapshot_dir: str,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_perm: int = 64, bands: int = 16,
                           num_buckets: int = NUM_FP_BUCKETS,
                           threshold: float = 0.8) -> Dataset:
    """Near-duplicate screen of an increment against the persisted band
    snapshot: the increment's band rows shuffle by the same bucket
    function, each task reads ITS snapshot bucket once, matches band
    keys, and verifies candidates by estimated Jaccard (fraction of
    agreeing signature slots >= ``threshold``).  The snapshot never
    moves.  Returns (id, is_dup) -- one row per NON-null-text increment
    doc (null-text docs produce no row: they have no signature, and the
    caller keeps them, matching the exact-dedup null rule)."""
    from .dedup import MinHasher

    class Exploder:
        def __init__(self) -> None:
            self.h = MinHasher(num_perm=num_perm)

        def __call__(self, b: pa.Table) -> pa.Table:
            return _band_sig_rows(b, id_col, text_col, self.h, bands,
                                  num_buckets)

    def screen(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([(id_col, pa.int64()),
                                ("dup_hits", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        bucket = int(t.column("bucket")[0].as_py())
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        post = _bucket_postings(snapshot_dir, bucket, id_col)
        if post is None or post.num_rows == 0:
            return pa.table({id_col: pa.array(np.unique(ids)),
                             "dup_hits": pa.array(
                                 np.zeros(len(np.unique(ids)), np.int64))},
                            schema=out_schema)
        # match increment band rows to snapshot postings on band_key
        inc = pa.table({"band_key": t.column("band_key"),
                        "__inc_id": t.column(id_col),
                        "__inc_sig": t.column("sig")})
        snap = pa.table({"band_key": post.column("band_key"),
                         "__old_id": post.column(id_col),
                         "__old_sig": post.column("sig")})
        m = inc.join(snap, keys=["band_key"], join_type="inner")
        hits = np.zeros(0, dtype=np.int64)
        if m.num_rows:
            a = np.frombuffer(
                b''.join(m.column("__inc_sig").to_pylist()), dtype=np.uint64
            ).reshape(m.num_rows, num_perm)
            bmat = np.frombuffer(
                b''.join(m.column("__old_sig").to_pylist()), dtype=np.uint64
            ).reshape(m.num_rows, num_perm)
            est = (a == bmat).mean(axis=1)
            ok = est >= threshold
            hits = np.unique(
                np.asarray(m.column("__inc_id"), dtype=np.int64)[ok])
        uniq = np.unique(ids)
        return pa.table({id_col: pa.array(uniq),
                         "dup_hits": pa.array(
                             np.isin(uniq, hits).astype(np.int64))},
                        schema=out_schema)

    from ray.data.aggregate import Sum

    hits = new_ds.map_batches(Exploder, batch_format="pyarrow",
                              concurrency=(1, 8)) \
        .groupby("bucket").map_groups(screen, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("dup_hits", alias_name="dup_hits"))

    def verdict(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([(id_col, pa.int64()),
                              ("is_dup", pa.bool_())]).empty_table()
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            "is_dup": pc.greater(b.column("dup_hits"),
                                 pa.scalar(0, pa.int64()))})

    return hits.map_batches(verdict, batch_format="pyarrow")


def append_band_snapshot(new_ds: Dataset, snapshot_dir: str,
                         increment_id: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_perm: int = 64, bands: int = 16,
                         num_buckets: int = NUM_FP_BUCKETS) -> str:
    """Fold an increment's band postings INTO the persisted snapshot --
    the second half of the incremental loop (screen the increment, then
    make its survivors visible to the NEXT increment).  Each increment
    writes its rows as NEW files under the same ``bucket=N/`` dirs
    (parquet dirs append by file; nothing rewrites), committed with a
    per-increment ``_SUCCESS.<increment_id>`` marker so a re-run of the
    same increment is a no-op and a torn append is redone -- the same
    idempotence contract as the reference's segment commits."""
    from .dedup import MinHasher

    marker = os.path.join(snapshot_dir, f"_SUCCESS.{increment_id}")
    if os.path.exists(marker):
        return snapshot_dir

    class Exploder:
        def __init__(self) -> None:
            self.h = MinHasher(num_perm=num_perm)

        def __call__(self, b: pa.Table) -> pa.Table:
            return _band_sig_rows(b, id_col, text_col, self.h, bands,
                                  num_buckets)

    # torn-append hygiene: drop any files from a previous failed run of
    # THIS increment before rewriting them -- BOTH the staging dir and
    # any live `inc-<id>-*` files a torn publish loop already moved in
    # (the redo's write_parquet generates fresh uuid names, so stale
    # published files would not be overwritten; they'd duplicate every
    # posting of this increment)
    stage_dir = os.path.join(snapshot_dir, f"_incoming.{increment_id}")
    shutil.rmtree(stage_dir, ignore_errors=True)
    for stale in glob.glob(os.path.join(
            snapshot_dir, "bucket=*", f"inc-{increment_id}-*.parquet")):
        os.remove(stale)
    new_ds.map_batches(Exploder, batch_format="pyarrow",
                       concurrency=(1, 8)) \
        .write_parquet(stage_dir, partition_cols=["bucket"])
    # atomic-ish publish: move each staged bucket file into the live
    # bucket dir under a unique name, then drop the marker
    for root, _dirs, files in os.walk(stage_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.relpath(root, stage_dir)
            dst_dir = os.path.join(snapshot_dir, rel)
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(os.path.join(root, f),
                       os.path.join(dst_dir, f"inc-{increment_id}-{f}"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("ok")
    return snapshot_dir
