"""Continuous sources: tail a GROWING directory of log shards, behind a
pluggable ``Source`` seam.

The reference's biggest component is the Kafka source
(/root/reference src/commands/sources/kafka_source.go:86-507): one
consumer per partition, checkpoint-aware start offsets, re-delivery
after a crash, all behind the ``Source`` interface
(src/commands/sources/mod.go:31-43).  The Ray-native analog for
object-store log pipelines is an ordered file tailer: producers append
IMMUTABLE files named ``{shard}_{seq}.parquet`` (log-rotation style;
parquet files are never appended in place), and

* a shard  <-> a Kafka partition,
* the file sequence number <-> the partition offset,
* the per-shard committed seq SET <-> the committed consumer offsets
  (an exact set, not a max-seq high-water mark: a file that becomes
  visible out of order -- slow writer, eventually-consistent listing --
  after a higher seq was committed is still picked up).

Offsets are NOT a separate checkpoint store: they are derived from the
committed manifest entries (each entry lists the units it consumed), so
"data durable" and "offset advanced" are one atomic commit -- the
crash-between-upload-and-checkpoint duplicate window of the reference
(kafka_checkpoint.go:108-138, SURVEY 2.10 at-least-once) cannot occur.
A batch is either fully committed or invisible; resume re-reads only
uncommitted units.  Single consumer per out_dir (the reference's
single-writer assumption, README.md:80-85).

The consume loop (``consume``) is source-agnostic: ``tail_ingest`` wires
it to a ``DirectoryTailSource``; a Kafka consumer (or any queue) can
drop in by implementing the same four methods.
"""

from __future__ import annotations

import os
import posixpath
import re
import time
from typing import Any, Protocol, runtime_checkable

import pyarrow.fs as pafs
import ray.data

from ..state.manifest import Manifest

_SEQ_RE = re.compile(r"^(?P<shard>.+?)[._-](?P<seq>\d+)\.parquet$")


def parse_shard_seq(filename: str) -> tuple[str, int] | None:
    m = _SEQ_RE.match(os.path.basename(filename))
    if not m:
        return None
    return m.group("shard"), int(m.group("seq"))


def discover_new_files(in_dir: str, committed: dict[str, Any]) -> list[str]:
    """Files not yet committed, ordered by (shard, seq) -- per-shard
    order is the only ordering guarantee, as with Kafka partitions.

    ``committed[shard]`` is either an exact set of committed seqs (the
    durable form -- out-of-order-visible files are never lost) or an int
    high-water mark (legacy convenience: seqs <= hw are committed)."""
    try:
        names = sorted(os.listdir(in_dir))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        ps = parse_shard_seq(n)
        if ps is None:
            continue
        shard, seq = ps
        c = committed.get(shard)
        if c is None:
            done = False
        elif isinstance(c, (set, frozenset)):
            done = seq in c
        else:
            done = seq <= c
        if not done:
            out.append((shard, seq, os.path.join(in_dir, n)))
    out.sort()
    return [p for _, _, p in out]


def committed_offsets(manifest: Manifest, kind: str = "tail"
                      ) -> tuple[dict[str, set[int]], int]:
    """(per-shard committed seq SETS, next batch id), both derived from
    committed manifest entries -- the offsets ARE the commit."""
    seqs: dict[str, set[int]] = {}
    next_bid = 0
    for e in manifest.entries():
        if e.get("kind") != kind:
            continue
        next_bid = max(next_bid, e["partition_id"] + 1)
        for f in e.get("shard_files", []):
            ps = parse_shard_seq(f)
            if ps is None:
                continue
            shard, seq = ps
            seqs.setdefault(shard, set()).add(seq)
    return seqs, next_bid


# -- Source seam ------------------------------------------------------------

@runtime_checkable
class Source(Protocol):
    """Pluggable continuous source (reference Source interface,
    src/commands/sources/mod.go:31-43).  Units are opaque, ordered,
    immutable chunks of the stream (files, Kafka offset ranges, ...)."""

    def poll(self) -> list[Any]:
        """New un-acked units since the committed position (ordered)."""

    def read(self, units: list[Any]) -> ray.data.Dataset:
        """Bounded Dataset over the given units."""

    def offsets(self, units: list[Any]) -> list[str]:
        """Durable unit names to record in the commit entry."""

    def ack(self, units: list[Any]) -> None:
        """Advance the in-memory position past committed units."""


class DirectoryTailSource:
    """The growing-directory tailer as a ``Source``."""

    def __init__(self, in_dir: str,
                 committed: dict[str, set[int]] | None = None) -> None:
        self.in_dir = in_dir
        self.seqs: dict[str, set[int]] = {
            k: set(v) for k, v in (committed or {}).items()}

    def poll(self) -> list[str]:
        return discover_new_files(self.in_dir, self.seqs)

    def read(self, units: list[str]) -> ray.data.Dataset:
        from ..functions.tableops import strip_meta
        # schema-metadata strip: pandas-written shards otherwise trigger
        # Ray's unhashable-schema warning storm downstream
        return ray.data.read_parquet(units) \
            .map_batches(strip_meta, batch_format="pyarrow")

    def offsets(self, units: list[str]) -> list[str]:
        return [os.path.basename(u) for u in units]

    def ack(self, units: list[str]) -> None:
        for u in units:
            ps = parse_shard_seq(u)
            if ps is not None:
                self.seqs.setdefault(ps[0], set()).add(ps[1])


class InMemorySource:
    """Toy queue source proving the seam: units are (name, pa.Table)
    items appended by a producer; used by tests and as the template for
    a real Kafka consumer."""

    def __init__(self) -> None:
        self._items: list[tuple[str, Any]] = []
        self._acked: set[str] = set()

    def append(self, name: str, table) -> None:
        self._items.append((name, table))

    def poll(self) -> list[tuple[str, Any]]:
        return [(n, t) for n, t in self._items if n not in self._acked]

    def read(self, units) -> ray.data.Dataset:
        import pyarrow as pa
        return ray.data.from_arrow(pa.concat_tables([t for _, t in units]))

    def offsets(self, units) -> list[str]:
        return [n for n, _ in units]

    def ack(self, units) -> None:
        self._acked.update(n for n, _ in units)


def consume(source: Source, out_dir: str,
            max_batches: int | None = None,
            max_idle_polls: int = 3,
            poll_interval_s: float = 0.2,
            transform=None,
            kind: str = "tail",
            filesystem: pafs.FileSystem | None = None) -> dict:
    """Source-agnostic consume loop: poll until ``max_idle_polls``
    consecutive empty polls (or ``max_batches``).  Each poll's new units
    form ONE bounded Dataset job: read -> optional ``transform(Dataset)``
    -> sink write -> atomic commit of {units, rows} (= data + offsets).

    Designed to be re-invoked forever (cron/service loop): every call
    resumes from the committed offsets recorded in the manifest."""
    manifest = Manifest(out_dir, filesystem)
    fs = manifest.fs
    _, bid = committed_offsets(manifest, kind)

    batches = 0
    rows = 0
    idle = 0
    while idle < max_idle_polls and (max_batches is None
                                     or batches < max_batches):
        units = source.poll()
        if not units:
            idle += 1
            time.sleep(poll_interval_s)
            continue
        idle = 0
        sink = posixpath.join(manifest.out_dir, "sinks", f"p{bid:05d}")
        if fs.get_file_info(sink).type != pafs.FileType.NotFound:
            fs.delete_dir(sink)          # uncommitted leftovers: invisible
        ds = source.read(units)
        if transform is not None:
            ds = transform(ds)
        ds.write_parquet(sink, filesystem=fs)
        import pyarrow.dataset as pads
        n = pads.dataset(sink, format="parquet", filesystem=fs).count_rows()
        manifest.commit(bid, {
            "kind": kind,
            "shard_files": source.offsets(units),
            "row_count": int(n),
            "sinks": {f"batch={bid}": {"rows": int(n), "bytes": 0}},
            "metrics": {},
        })
        source.ack(units)
        rows += int(n)
        bid += 1
        batches += 1
    return {
        "batches_this_run": batches,
        "rows_this_run": rows,
        "total_rows": sum(e["row_count"] for e in manifest.entries()
                          if e.get("kind") == kind),
    }


def tail_ingest(in_dir: str, out_dir: str,
                max_batches: int | None = None,
                max_idle_polls: int = 3,
                poll_interval_s: float = 0.2,
                transform=None,
                filesystem: pafs.FileSystem | None = None) -> dict:
    """Consume a growing directory via the generic loop (see ``consume``)."""
    manifest = Manifest(out_dir, filesystem)
    seqs, _ = committed_offsets(manifest, "tail")
    src = DirectoryTailSource(in_dir, seqs)
    res = consume(src, out_dir, max_batches=max_batches,
                  max_idle_polls=max_idle_polls,
                  poll_interval_s=poll_interval_s,
                  transform=transform, kind="tail", filesystem=filesystem)
    res["high_water"] = {k: max(v) for k, v in sorted(src.seqs.items()) if v}
    return res
