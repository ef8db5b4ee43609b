"""Compaction: merge many small committed sink files into fewer, bigger
ones -- reference `merge` command parity (/root/reference
src/commands/merge.go:24-85) with its correctness gap fixed: the
reference re-reads segments from the LOCAL build dir (merge.go:114) so
merge only works on the indexing machine; here compaction reads the
durable sink files.

Atomic swap: the compacted entry records its source partitions in
``compacted_from``; ``Manifest.entries()`` excludes any partition so
listed, so the swap is complete THE INSTANT the new entry commits -- a
crash between the commit and the old-entry/file deletes leaves both
generations on disk but only the new one visible (no double-counting).
Old entries and files are then deleted best-effort, never read again
(metadata-first, leak-tolerant: merge.go:180-237, drop.go:47-75).
"""

from __future__ import annotations

import posixpath

from ..state.manifest import Manifest
from ..stages.aggregate import SINK_KEYS
from .ingest import _read_committed, _read_back_counts


def compact(out_dir: str, target_partitions: int = 1,
            filesystem=None, keep_history: bool = False) -> dict:
    """read committed sinks -> repartition -> rewrite as one compacted
    partition -> atomic manifest supersede.

    ``keep_history=True`` retains the superseded entries AND their sink
    data (``Manifest.entries()`` hides them via ``compacted_from``
    regardless), enabling ``Manifest.entries_as_of(ts)`` time-travel
    reads of pre-compaction snapshots at the cost of double storage
    until a later cleanup."""
    manifest = Manifest(out_dir, filesystem)
    old_ids = sorted(manifest.committed_ids())
    if len(old_ids) < 2:
        # reference guard: need >=2 segments (merge.go:37-40)
        raise ValueError("compaction needs >=2 committed partitions")
    old_dirs = manifest.committed_sink_dirs()

    new_id = max(old_ids) + 1
    new_dir = posixpath.join(manifest.out_dir, "sinks", f"p{new_id:05d}")
    import pyarrow.fs as pafs
    if manifest.fs.get_file_info(new_dir).type != pafs.FileType.NotFound:
        manifest.fs.delete_dir(new_dir)

    ds = _read_committed(out_dir, columns=None, filesystem=manifest.fs)
    from .ingest import _cast_partition_cols
    ds = ds.map_batches(_cast_partition_cols, batch_format="pyarrow")
    if target_partitions:
        ds = ds.repartition(target_partitions)
    ds.write_parquet(new_dir, filesystem=manifest.fs,
                     partition_cols=SINK_KEYS, row_group_size=131072)

    agg = _read_back_counts(new_dir, manifest.fs)
    sinks = {
        f"lang={r['lang']}/host_bucket={r['host_bucket']}":
            {"rows": r["doc_count"], "bytes": r["byte_count"]}
        for r in agg.to_pylist()
    }
    shards = sorted({s for e in manifest.entries()
                     for s in e.get("shard_files", [])})
    # THE atomic swap: one commit that both publishes the new partition
    # and (via compacted_from) retires the old ones
    manifest.commit(new_id, {
        "shard_files": shards,
        "row_count": sum(m["rows"] for m in sinks.values()),
        "sinks": sinks,
        "compacted_from": old_ids,
        "metrics": {},
    })
    if not keep_history:
        for pid in old_ids:                  # best-effort, leak-tolerant
            manifest.retire(pid)
        for d in old_dirs:
            try:
                manifest.fs.delete_dir(d)
            except (FileNotFoundError, OSError):
                pass
    return {"new_partition": new_id, "merged": old_ids,
            "rows": sum(m["rows"] for m in sinks.values())}
