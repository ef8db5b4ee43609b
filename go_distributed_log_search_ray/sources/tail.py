"""Continuous source: tail a GROWING directory of log shards.

The reference's biggest component is the Kafka source
(/root/reference src/commands/sources/kafka_source.go:86-507): one
consumer per partition, checkpoint-aware start offsets, re-delivery
after a crash.  The Ray-native analog for object-store log pipelines is
an ordered file tailer: producers append IMMUTABLE files named
``{shard}_{seq}.parquet`` (log-rotation style; parquet files are never
appended in place), and

* a shard  <-> a Kafka partition,
* the file sequence number <-> the partition offset,
* the per-shard high-water mark <-> the committed consumer offset.

Offsets are NOT a separate checkpoint store: they are derived from the
committed manifest entries (each entry lists the files it consumed), so
"data durable" and "offset advanced" are one atomic commit -- the
crash-between-upload-and-checkpoint duplicate window of the reference
(kafka_checkpoint.go:108-138, SURVEY 2.10 at-least-once) cannot occur.
A batch is either fully committed or invisible; resume re-reads only
uncommitted files.  Single consumer per out_dir (the reference's
single-writer assumption, README.md:80-85).
"""

from __future__ import annotations

import os
import posixpath
import re
import time

import pyarrow.fs as pafs
import ray.data

from ..state.manifest import Manifest

_SEQ_RE = re.compile(r"^(?P<shard>.+?)[._-](?P<seq>\d+)\.parquet$")


def parse_shard_seq(filename: str) -> tuple[str, int] | None:
    m = _SEQ_RE.match(os.path.basename(filename))
    if not m:
        return None
    return m.group("shard"), int(m.group("seq"))


def discover_new_files(in_dir: str, high_water: dict[str, int]
                       ) -> list[str]:
    """Files beyond each shard's committed high-water mark, ordered by
    (shard, seq) -- per-shard order is the only ordering guarantee, as
    with Kafka partitions."""
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
        if seq > high_water.get(shard, -1):
            out.append((shard, seq, os.path.join(in_dir, n)))
    out.sort()
    return [p for _, _, p in out]


def _high_water(manifest: Manifest) -> tuple[dict[str, int], int]:
    """(per-shard committed high-water marks, next batch id), both
    derived from committed manifest entries."""
    hw: dict[str, int] = {}
    next_bid = 0
    for e in manifest.entries():
        if e.get("kind") != "tail":
            continue
        next_bid = max(next_bid, e["partition_id"] + 1)
        for f in e.get("shard_files", []):
            ps = parse_shard_seq(f)
            if ps is None:
                continue
            shard, seq = ps
            hw[shard] = max(hw.get(shard, -1), seq)
    return hw, next_bid


def tail_ingest(in_dir: str, out_dir: str,
                max_batches: int | None = None,
                max_idle_polls: int = 3,
                poll_interval_s: float = 0.2,
                transform=None,
                filesystem: pafs.FileSystem | None = None) -> dict:
    """Consume the growing directory until ``max_idle_polls`` consecutive
    empty polls (or ``max_batches`` batches).  Each poll's new files form
    ONE bounded Dataset job: read -> optional ``transform(Dataset)`` ->
    sink write -> atomic commit of {files, rows} (= data + offsets).

    Designed to be re-invoked forever (cron/service loop): every call
    resumes from the committed offsets."""
    manifest = Manifest(out_dir, filesystem)
    fs = manifest.fs
    hw, bid = _high_water(manifest)

    batches = 0
    rows = 0
    idle = 0
    while idle < max_idle_polls and (max_batches is None
                                     or batches < max_batches):
        files = discover_new_files(in_dir, hw)
        if not files:
            idle += 1
            time.sleep(poll_interval_s)
            continue
        idle = 0
        sink = posixpath.join(manifest.out_dir, "sinks", f"p{bid:05d}")
        if fs.get_file_info(sink).type != pafs.FileType.NotFound:
            fs.delete_dir(sink)          # uncommitted leftovers: invisible
        ds = ray.data.read_parquet(files)
        if transform is not None:
            ds = transform(ds)
        ds.write_parquet(sink, filesystem=fs)
        import pyarrow.dataset as pads
        n = pads.dataset(sink, format="parquet", filesystem=fs).count_rows()
        manifest.commit(bid, {
            "kind": "tail",
            "shard_files": [os.path.basename(f) for f in files],
            "row_count": int(n),
            "sinks": {f"batch={bid}": {"rows": int(n), "bytes": 0}},
            "metrics": {},
        })
        for f in files:
            shard, seq = parse_shard_seq(f)
            hw[shard] = max(hw.get(shard, -1), seq)
        rows += int(n)
        bid += 1
        batches += 1
    return {
        "batches_this_run": batches,
        "rows_this_run": rows,
        "high_water": dict(sorted(hw.items())),
        "total_rows": sum(e["row_count"] for e in manifest.entries()
                          if e.get("kind") == "tail"),
    }
