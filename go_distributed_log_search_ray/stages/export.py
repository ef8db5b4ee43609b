"""Training-shard export: deterministic global scatter into N parquet
shards, the write-side terminal of a corpus-prep pipeline.

Trainers want (a) a FIXED shard count decoupled from the cluster's
block layout, (b) a global scatter so each shard is an unbiased sample
of the corpus (no source-file locality -- consecutive crawl pages must
not land in one shard), (c) determinism: the same corpus exports the
same shards on any cluster size, so a resumed/re-run job is
byte-compatible, and (d) resumability.

``ray.data.random_shuffle`` gives (b) but not (c)/(a) (non-seeded
order across cluster sizes, shard count = block count).  This operator
instead derives the shard from a seeded md5 of the document id -- the
same ``md5(seed || ':' || id)`` primitive as `stages/sampling.py`, so
the assignment is reproducible in SQL bit-for-bit -- and routes rows
with one partitioned write.  Shard quality is hash-uniformity (the
id-hash is independent of any corpus ordering), which is exactly the
random_shuffle guarantee trainers rely on, made deterministic.

Scale shape: one streaming pass; the partitioned write is the only
exchange and it moves each row once.  ``_SUCCESS`` commit marker makes
re-export idempotent (the reference's segment-commit semantics,
src/unified_index/writer.go).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .sampling import hash_buckets

_U32_SPAN = 1 << 32


def shard_of(ids: pa.Array | pa.ChunkedArray, num_shards: int,
             seed: int = 19) -> np.ndarray:
    """Deterministic shard per id: ``(md5_bucket(id) * num_shards) >>
    32``.  Null ids shard to ``num_shards`` (a quarantine shard, never
    silently dropped).  SQL equivalent for power-of-two N:
    ``('0x' || substr(md5(seed || ':' || CAST(id AS VARCHAR)), 1, 8))
    ::UBIGINT // (2^32 // N)``."""
    b = hash_buckets(ids, seed=seed)        # u64; nulls = 2^32 sentinel
    shard = (b * np.uint64(num_shards)) >> np.uint64(32)
    return shard.astype(np.int64)


def export_training_shards(ds: Dataset, out_dir: str, num_shards: int,
                           id_col: str = "doc_id",
                           seed: int = 19) -> str:
    """Scatter ``ds`` into ``shard=N/`` parquet, deterministically by
    id hash; idempotent via ``_SUCCESS``."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    # torn-write hygiene: a run killed mid write_parquet leaves partial
    # shard files with no _SUCCESS, and the redo appends new
    # uniquely-named files -- readers glob the dir, so stale partials
    # would silently duplicate rows.  Rebuild from scratch.
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "shard", pa.array(shard_of(b.column(id_col), num_shards,
                                       seed)))

    ds.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["shard"])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def shard_manifest(out_dir: str) -> Dataset:
    """Read the exported shards back and fold a per-shard manifest --
    the read-back IS the verification that the sink wrote what the
    scatter assigned."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(out_dir)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["shard"]).aggregate([([], "count_all")])
        return g.rename_columns(["shard", "n_docs"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("shard").aggregate(Sum("n_docs", alias_name="n_docs"))
