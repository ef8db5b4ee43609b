"""Continuous directory-tail source (Kafka analog): ordered shard
tailing with per-shard offsets derived from committed manifest entries;
exactly-once across crash/resume and while the directory keeps growing."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_distributed_log_search_ray.sources.tail import (
    discover_new_files, parse_shard_seq, tail_ingest)
from go_distributed_log_search_ray.state.manifest import Manifest


def _write(d, shard, seq, ids):
    pq.write_table(pa.table({"event_id": pa.array(ids, pa.int64()),
                             "shard": pa.array([shard] * len(ids))}),
                   os.path.join(d, f"{shard}_{seq:04d}.parquet"))


def _all_rows(out):
    import pyarrow.dataset as pads
    ids = []
    for d in Manifest(out).committed_sink_dirs():
        if os.path.isdir(d):
            ids.extend(pads.dataset(d, format="parquet")
                       .to_table(columns=["event_id"])
                       .column("event_id").to_pylist())
    return sorted(ids)


def test_parse_and_discover(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(d, "s0", 0, [1])
    _write(d, "s0", 1, [2])
    _write(d, "s1", 0, [3])
    assert parse_shard_seq("s0_0001.parquet") == ("s0", 1)
    assert parse_shard_seq("not-a-shard.txt") is None
    new = discover_new_files(d, {"s0": 0})
    assert [os.path.basename(f) for f in new] == [
        "s0_0001.parquet", "s1_0000.parquet"]


def test_tail_consumes_growing_directory_exactly_once(tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write(src, "s0", 0, [0, 1])
    _write(src, "s1", 0, [10, 11])
    r1 = tail_ingest(src, out, max_batches=1)
    assert r1["rows_this_run"] == 4
    assert r1["high_water"] == {"s0": 0, "s1": 0}

    # the log grows; a later invocation resumes from committed offsets
    _write(src, "s0", 1, [2, 3])
    _write(src, "s1", 1, [12])
    r2 = tail_ingest(src, out, max_batches=1)
    assert r2["rows_this_run"] == 3
    assert r2["total_rows"] == 7
    assert _all_rows(out) == [0, 1, 2, 3, 10, 11, 12]

    # idle polls terminate cleanly with nothing new
    r3 = tail_ingest(src, out, max_idle_polls=1, poll_interval_s=0.01)
    assert r3["batches_this_run"] == 0
    assert r3["total_rows"] == 7


def test_tail_crash_before_commit_redelivers_without_dup(tmp_path):
    """Sink written but entry never committed (crash in the window the
    reference re-indexes, SURVEY 2.10): resume re-processes those files
    exactly once -- offsets live IN the commit, so they never advanced."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write(src, "s0", 0, [0, 1])
    tail_ingest(src, out, max_batches=1)
    _write(src, "s0", 1, [2, 3])
    tail_ingest(src, out, max_batches=1)
    # emulate crash after the second batch's write but before its commit
    m = Manifest(out)
    m.retire(1)
    r = tail_ingest(src, out, max_batches=1)
    assert r["rows_this_run"] == 2            # redelivered, once
    assert _all_rows(out) == [0, 1, 2, 3]     # no dup, no gap


def test_tail_transform_applies(tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write(src, "s0", 0, list(range(10)))

    def keep_even(ds):
        import pyarrow.compute as pc
        return ds.map_batches(
            lambda b: b.filter(pc.equal(pc.bit_wise_and(
                b.column("event_id"), pa.scalar(1)), 0)),
            batch_format="pyarrow")

    r = tail_ingest(src, out, max_batches=1, transform=keep_even)
    assert r["rows_this_run"] == 5
    assert _all_rows(out) == [0, 2, 4, 6, 8]
