"""Compaction: merge many small committed sink files into fewer, bigger
ones -- reference `merge` command parity (/root/reference
src/commands/merge.go:24-85) with its correctness gap fixed: the
reference re-reads segments from the LOCAL build dir (merge.go:114) so
merge only works on the indexing machine; here compaction reads the
durable sink files.  Ordering follows drop/merge's metadata-first rule:
new files written -> manifest swapped atomically -> old files deleted
best-effort (leaks tolerated, never read again: merge.go:180-237).
"""

from __future__ import annotations

import os
import shutil

from ..state.manifest import Manifest
from ..stages.aggregate import SINK_KEYS
from .ingest import _read_committed, _read_back_counts


def compact(out_dir: str, target_partitions: int = 1) -> dict:
    """read committed sinks -> repartition -> rewrite as one compacted
    partition -> swap manifest."""
    manifest = Manifest(out_dir)
    old_ids = sorted(manifest.committed_ids())
    if len(old_ids) < 2:
        # reference guard: need >=2 segments (merge.go:37-40)
        raise ValueError("compaction needs >=2 committed partitions")
    old_dirs = manifest.committed_sink_dirs()

    new_id = max(old_ids) + 1
    new_dir = os.path.join(out_dir, "sinks", f"p{new_id:05d}")
    if os.path.isdir(new_dir):
        shutil.rmtree(new_dir)

    ds = _read_committed(out_dir, columns=None)
    from .ingest import _cast_partition_cols
    ds = ds.map_batches(_cast_partition_cols, batch_format="pyarrow")
    if target_partitions:
        ds = ds.repartition(target_partitions)
    ds.write_parquet(new_dir, partition_cols=SINK_KEYS, row_group_size=131072)

    agg = _read_back_counts(new_dir)
    sinks = {
        f"lang={r['lang']}/host_bucket={r['host_bucket']}":
            {"rows": r["doc_count"], "bytes": r["byte_count"]}
        for r in agg.to_pylist()
    }
    shards = sorted({s for e in manifest.entries()
                     for s in e.get("shard_files", [])})
    # commit new entry FIRST, then retire old entries, then delete files
    manifest.commit(new_id, {
        "shard_files": shards,
        "row_count": sum(m["rows"] for m in sinks.values()),
        "sinks": sinks,
        "metrics": {"compacted_from": old_ids},
    })
    for pid in old_ids:
        os.remove(manifest.entry_path(pid))
    for d in old_dirs:                       # best-effort, leak-tolerant
        shutil.rmtree(d, ignore_errors=True)
    return {"new_partition": new_id, "merged": old_ids,
            "rows": sum(m["rows"] for m in sinks.values())}
