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
* on a local filesystem the entry is JSON written to a temp name then
  atomically renamed; on object stores (S3-style, reference
  src/s3/minio.go:24-157) a single whole-object PUT of the final key is
  itself atomic, so the temp+rename step is skipped;
* resume = list committed entries, skip those partitions' input shards;
* compaction supersedes atomically: the compacted entry lists its source
  partitions in ``compacted_from``, and ``entries()`` excludes any
  partition so listed -- the swap is complete the instant the new entry
  commits, old entry files are deleted best-effort afterwards
  (metadata-first, leak-tolerant, like the reference's merge.go:180-237).

Storage goes through ``pyarrow.fs`` so ``out_dir`` may be a plain local
path, a ``file://``/``s3://``-style URI, or an explicit
``pyarrow.fs.FileSystem`` (e.g. SubTreeFileSystem in tests).

An entry (FIXTURES.md F4):
  {partition_id, shard_files, row_count, sinks: {"lang=../host_bucket=..":
   {rows, bytes}}, metrics: {...}, status: "committed"}
"""

from __future__ import annotations

import json
import posixpath
import time
from typing import Any

import pyarrow.fs as pafs


def resolve_fs(path: str, filesystem: pafs.FileSystem | None = None
               ) -> tuple[pafs.FileSystem, str]:
    """(filesystem, normalized path) for a plain path, URI, or explicit
    filesystem object."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


class Manifest:
    def __init__(self, out_dir: str,
                 filesystem: pafs.FileSystem | None = None) -> None:
        self.fs, self.out_dir = resolve_fs(out_dir, filesystem)
        self.dir = posixpath.join(self.out_dir, "manifest")
        self.fs.create_dir(self.dir, recursive=True)
        self._is_local = isinstance(self.fs, pafs.LocalFileSystem)

    # -- commit protocol ---------------------------------------------------

    def entry_path(self, partition_id: int) -> str:
        return posixpath.join(self.dir, f"p{partition_id:05d}.json")

    def commit(self, partition_id: int, entry: dict[str, Any]) -> None:
        entry = dict(entry)
        entry["partition_id"] = partition_id
        entry["status"] = "committed"
        entry["committed_at"] = time.time()
        payload = json.dumps(entry).encode()
        final = self.entry_path(partition_id)
        if self._is_local:
            # POSIX: write-temp + rename is the atomic publish
            tmp = final + ".tmp"
            with self.fs.open_output_stream(tmp) as f:
                f.write(payload)
            self.fs.move(tmp, final)
        else:
            # object store: a single whole-object PUT of the final key is
            # atomic; a rename would be a copy+delete (NOT atomic on S3)
            with self.fs.open_output_stream(final) as f:
                f.write(payload)

    def _raw_entries(self) -> list[dict[str, Any]]:
        try:
            infos = self.fs.get_file_info(pafs.FileSelector(self.dir))
        except (FileNotFoundError, OSError):
            return []
        es = []
        for info in infos:
            name = posixpath.basename(info.path)
            if not (name.startswith("p") and name.endswith(".json")):
                continue
            with self.fs.open_input_stream(info.path) as f:
                es.append(json.loads(f.read()))
        return es

    def entries(self) -> list[dict[str, Any]]:
        """Committed entries with compaction supersede applied: any
        partition listed in a committed entry's ``compacted_from`` is
        invisible even if its file still exists (crash between the
        compaction commit and the old-entry deletes cannot double-count)."""
        raw = self._raw_entries()
        superseded: set[int] = set()
        for e in raw:
            superseded.update(e.get("compacted_from", []))
        return sorted((e for e in raw
                       if e["partition_id"] not in superseded),
                      key=lambda e: e["partition_id"])

    def committed_ids(self) -> set[int]:
        return {e["partition_id"] for e in self.entries()}

    def entry_for(self, partition_id: int) -> dict[str, Any] | None:
        for e in self.entries():
            if e["partition_id"] == partition_id:
                return e
        return None

    def retire(self, partition_id: int) -> None:
        """Delete one entry file (used for stale entries on resume and
        for best-effort cleanup after a compaction supersede)."""
        try:
            self.fs.delete_file(self.entry_path(partition_id))
        except (FileNotFoundError, OSError):
            pass

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
            posixpath.join(self.out_dir, "sinks", f"p{e['partition_id']:05d}")
            for e in self.entries()
        ]

    # -- time travel ---------------------------------------------------------

    def entries_as_of(self, ts: float) -> list[dict[str, Any]]:
        """Snapshot-isolation view of the catalog at time ``ts``
        (Iceberg-style time travel over the commit log): committed
        entries with ``committed_at <= ts``, compaction supersede
        applied only for compactions themselves committed by ``ts`` --
        a reader pinned to ``ts`` never sees a half-applied compaction.
        Requires history retention (``compact(keep_history=True)``);
        under best-effort cleanup, snapshots older than the last
        cleanup degrade to whatever entry files remain."""
        raw = [e for e in self._raw_entries()
               if e.get("committed_at", 0) <= ts]
        superseded: set[int] = set()
        for e in raw:
            superseded.update(e.get("compacted_from", []))
        return sorted((e for e in raw
                       if e["partition_id"] not in superseded),
                      key=lambda e: e["partition_id"])

    def committed_sink_dirs_as_of(self, ts: float) -> list[str]:
        """Sink directories visible to a reader pinned at ``ts``."""
        return [
            posixpath.join(self.out_dir, "sinks", f"p{e['partition_id']:05d}")
            for e in self.entries_as_of(ts)
        ]

    def compacted_shard_files(self) -> set[str]:
        """Union of input shards covered by committed COMPACTED entries --
        an ingest resume must not re-process these even though their
        original per-partition entries are gone."""
        out: set[str] = set()
        for e in self.entries():
            if e.get("compacted_from"):
                out.update(e.get("shard_files", []))
        return out

    def drop(self) -> None:
        """Reference 'drop': delete metadata first, files best-effort
        (src/commands/drop.go:15-87)."""
        try:
            self.fs.delete_dir(self.dir)
        except (FileNotFoundError, OSError):
            pass
        try:
            self.fs.delete_dir(posixpath.join(self.out_dir, "sinks"))
        except (FileNotFoundError, OSError):
            pass
