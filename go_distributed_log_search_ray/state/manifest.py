"""Object-store manifest: per-partition lineage + exactly-once resume.

Replaces the reference's SQL catalog + Kafka checkpoints
(migrations/sqlite_schema.sql:7-22, commit chain
src/commands/index.go:249-277, checkpoint upsert
src/commands/sources/kafka_checkpoint.go:108-138).  The reference is
at-least-once (crash between segment upload and checkpoint re-indexes the
window, SURVEY 2.10); here a partition is either fully committed (its
entry file exists) or invisible, upgrading routed-row delivery to
exactly-once:

* sink files are written under the partition's own directory
  ``sinks/p{ID}/``; nothing outside a committed manifest entry is ever
  read ("DB row first, leaked files never read again" --
  src/commands/drop.go:47-75 inverted for creation);
* the entry is JSON written to a temp name then ``os.replace``d --
  atomic on POSIX;
* resume = list committed entries, skip those partitions' input shards.

An entry (FIXTURES.md F4):
  {partition_id, shard_files, row_count, sinks: {"lang=../host_bucket=..":
   {rows, bytes}}, metrics: {...}, status: "committed"}
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class Manifest:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def entry_path(self, partition_id: int) -> str:
        return os.path.join(self.dir, f"p{partition_id:05d}.json")

    def commit(self, partition_id: int, entry: dict[str, Any]) -> None:
        entry = dict(entry)
        entry["partition_id"] = partition_id
        entry["status"] = "committed"
        entry["committed_at"] = time.time()
        tmp = self.entry_path(partition_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.entry_path(partition_id))

    def committed_ids(self) -> set[int]:
        out = set()
        if not os.path.isdir(self.dir):
            return out
        for name in os.listdir(self.dir):
            if name.endswith(".json") and name.startswith("p"):
                out.add(int(name[1:-5]))
        return out

    def entries(self) -> list[dict[str, Any]]:
        es = []
        for pid in sorted(self.committed_ids()):
            with open(self.entry_path(pid)) as f:
                es.append(json.load(f))
        return es

    # -- derived views -----------------------------------------------------

    def total_sink_counts(self) -> dict[str, dict[str, int]]:
        """Fold committed per-partition sink aggregates (driver-side,
        |sinks| is tiny)."""
        agg: dict[str, dict[str, int]] = {}
        for e in self.entries():
            for sink, m in e.get("sinks", {}).items():
                a = agg.setdefault(sink, {"rows": 0, "bytes": 0})
                a["rows"] += m["rows"]
                a["bytes"] += m["bytes"]
        return agg

    def committed_sink_dirs(self) -> list[str]:
        """Only directories named by committed entries are visible."""
        return [
            os.path.join(self.out_dir, "sinks", f"p{e['partition_id']:05d}")
            for e in self.entries()
        ]

    def drop(self) -> None:
        """Reference 'drop': delete metadata first, files best-effort
        (src/commands/drop.go:15-87)."""
        import shutil
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
        sinks = os.path.join(self.out_dir, "sinks")
        if os.path.isdir(sinks):
            shutil.rmtree(sinks, ignore_errors=True)
