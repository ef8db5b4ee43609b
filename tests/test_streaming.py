"""Commit-interval window ingest (streaming analog, SURVEY 2.10):
window cut, per-window commit, exactly-once resume, pushed-down range
scans (no per-window full rescan)."""

import duckdb
import pytest

from go_distributed_log_search_ray.pipelines.streaming import (
    WINDOW_US, run_windowed_ingest, window_bounds)
from go_distributed_log_search_ray.state.manifest import Manifest


def test_window_bounds(sf001):
    ws = window_bounds(f"{sf001}/events.parquet")
    assert len(ws) > 1
    assert all(b - a == 3_600_000_000 for a, b in zip(ws, ws[1:]))


def test_windowed_ingest_counts_match_oracle(sf001, tmp_path):
    out = str(tmp_path / "w")
    res = run_windowed_ingest(f"{sf001}/events.parquet", out, resume=False,
                              max_windows=6)
    oracle = dict(duckdb.connect().execute(f"""
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) * 1000000 AS w,
               count(*) AS n
        FROM read_parquet('{sf001}/events.parquet') GROUP BY 1""").fetchall())
    entries = Manifest(out).entries()
    assert len(entries) == 6
    for e in entries:
        # empty windows (hour gaps) legitimately commit 0 rows
        assert e["row_count"] == oracle.get(e["window_start_us"], 0)
        # manifest key is the ABSOLUTE window id, not a positional index
        assert e["partition_id"] == e["window_start_us"] // WINDOW_US
    assert sum(e["row_count"] for e in entries) > 0


def test_windowed_resume_skips_committed(sf001, tmp_path):
    out = str(tmp_path / "w2")
    run_windowed_ingest(f"{sf001}/events.parquet", out, resume=False,
                        max_windows=3)
    res = run_windowed_ingest(f"{sf001}/events.parquet", out, resume=True,
                              max_windows=6)
    first3 = [w // WINDOW_US for w in
              window_bounds(f"{sf001}/events.parquet")[:3]]
    assert res["skipped"] == sorted(first3)
    # exactly-once: totals equal an uninterrupted 6-window run
    fresh = str(tmp_path / "w3")
    res2 = run_windowed_ingest(f"{sf001}/events.parquet", fresh, resume=False,
                               max_windows=6)
    assert res["total_rows"] == res2["total_rows"]


def test_windowed_scan_is_bounded(sf001, tmp_path):
    """24 windows must NOT cost 24 full scans: the ts range filter is
    pushed into the read and windows share one range-scan job, so the
    row groups touched stay within 2x the file's row groups."""
    out = str(tmp_path / "w4")
    res = run_windowed_ingest(f"{sf001}/events.parquet", out, resume=False,
                              max_windows=24)
    assert res["jobs"] <= 2
    assert res["row_groups_scanned"] <= 2 * res["row_groups_total"]


def _shard_events(sf001, tmp_path, n_shards=3):
    """Split the events table into n time-interleaved parquet shards."""
    import os
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf001}/events.parquet")
    d = str(tmp_path / "events_shards")
    os.makedirs(d, exist_ok=True)
    for i in range(n_shards):
        idx = list(range(i, t.num_rows, n_shards))
        pq.write_table(t.take(idx), os.path.join(d, f"part_{i:04d}.parquet"),
                       row_group_size=2048)
    return d


def test_windowed_ingest_multi_file_matches_single(sf001, tmp_path):
    """A sharded events directory must produce the same per-window
    counts as the single-file input (verdict r2: the streaming mode must
    consume a partitioned stream, not one parquet file)."""
    d = _shard_events(sf001, tmp_path)
    out_s = str(tmp_path / "ws")
    out_m = str(tmp_path / "wm")
    run_windowed_ingest(f"{sf001}/events.parquet", out_s, resume=False,
                        max_windows=6)
    run_windowed_ingest(d, out_m, resume=False, max_windows=6)
    single = {e["partition_id"]: e["row_count"]
              for e in Manifest(out_s).entries()}
    multi = {e["partition_id"]: e["row_count"]
             for e in Manifest(out_m).entries()}
    assert multi == single and sum(multi.values()) > 0


def test_windowed_scan_is_bounded_sharded(sf001, tmp_path):
    """Pushed-down range scans stay bounded across fragments too: row
    groups touched <= 2x total row groups over all shards."""
    d = _shard_events(sf001, tmp_path)
    out = str(tmp_path / "wsb")
    res = run_windowed_ingest(d, out, resume=False, max_windows=24)
    assert res["jobs"] <= 2
    assert res["row_groups_scanned"] <= 2 * res["row_groups_total"]


def test_footer_stats_missing_degrades_gracefully(tmp_path):
    """Parquet written without statistics must not crash: bounds fall
    back to reading the ts column and the file scans in every range."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.streaming import (
        _ts_footer_stats)
    t = pa.table({"ts": pa.array([1_000_000, 7_200_000_000_000],
                                 pa.timestamp("us")),
                  "v": [1, 2]})
    p = str(tmp_path / "nostats.parquet")
    pq.write_table(t, p, write_statistics=False)
    lo, hi, n_rg, rgs = _ts_footer_stats(p)
    assert lo == 1_000_000 and hi == 7_200_000_000_000
    assert all(mn < -(1 << 61) and mx > (1 << 61) for mn, mx in rgs)
    out = str(tmp_path / "wns")
    res = run_windowed_ingest(p, out, resume=False)
    assert res["total_rows"] == 2


def test_tag_window_floor_semantics_negative_ts(tmp_path):
    """Pre-1970 timestamps must floor into the window grid (pc.divide
    truncation would put them one window too high)."""
    import pyarrow as pa
    from go_distributed_log_search_ray.pipelines.streaming import (
        _tag_window)
    t = pa.table({"ts": pa.array([-1, 0, WINDOW_US - 1, -WINDOW_US],
                                 pa.timestamp("us"))})
    wid = _tag_window(t, WINDOW_US).column("window_id").to_pylist()
    assert wid == [-1, 0, 0, -1]


def test_tail_windowed_ingest_live_producer(tmp_path):
    """Compose tail + windows: a producer appends shards between polls;
    windowed totals commit exactly once and match the oracle."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.streaming import (
        tail_windowed_ingest, window_rows)

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)

    def emit(shard, seq, hours):
        ts = pa.array([h * WINDOW_US + 5 for h in hours], pa.timestamp("us"))
        pq.write_table(pa.table({"ts": ts, "v": list(range(len(hours)))}),
                       os.path.join(src, f"{shard}_{seq:04d}.parquet"))

    emit("s0", 0, [0, 0, 1])
    emit("s1", 0, [1, 2])
    r1 = tail_windowed_ingest(src, out, max_batches=1)
    assert r1["rows_this_run"] == 5
    assert r1["window_rows"] == {0: 2, 1: 2, 2: 1}

    # stream grows; late rows for an OLD window still land additively
    emit("s0", 1, [0, 3])
    r2 = tail_windowed_ingest(src, out, max_batches=1)
    assert r2["rows_this_run"] == 2
    assert window_rows(out) == {0: 3, 1: 2, 2: 1, 3: 1}

    # crash between write and commit: retire the last entry -> resume
    # redelivers those files exactly once
    m = Manifest(out)
    m.retire(1)
    r3 = tail_windowed_ingest(src, out, max_batches=1)
    assert r3["rows_this_run"] == 2
    assert window_rows(out) == {0: 3, 1: 2, 2: 1, 3: 1}
    assert r3["total_rows"] == 7


def test_source_seam_in_memory(tmp_path):
    """The consume loop is source-agnostic: a toy in-memory queue runs
    through the same poll/read/commit/ack protocol as the dir tailer."""
    import pyarrow as pa
    from go_distributed_log_search_ray.sources.tail import (
        InMemorySource, Source, DirectoryTailSource, consume)

    assert isinstance(InMemorySource(), Source)
    assert isinstance(DirectoryTailSource("/nonexistent"), Source)

    out = str(tmp_path / "out")
    q = InMemorySource()
    q.append("m0", pa.table({"x": [1, 2]}))
    q.append("m1", pa.table({"x": [3]}))
    r1 = consume(q, out, max_batches=1, kind="queue")
    assert r1["rows_this_run"] == 3
    q.append("m2", pa.table({"x": [4]}))
    r2 = consume(q, out, max_batches=1, kind="queue")
    assert r2["rows_this_run"] == 1 and r2["total_rows"] == 4
    e = Manifest(out).entries()
    assert sorted(sum((x["shard_files"] for x in e
                       if x.get("kind") == "queue"), [])) == ["m0", "m1", "m2"]


def test_tail_out_of_order_file_not_lost(tmp_path):
    """A file that becomes visible AFTER a higher seq was committed (slow
    writer / eventually-consistent listing) must still be consumed: the
    committed position is an exact seq set, not a max high-water mark."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.sources.tail import tail_ingest

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)

    def w(seq, ids):
        pq.write_table(pa.table({"event_id": pa.array(ids, pa.int64())}),
                       os.path.join(src, f"s0_{seq:04d}.parquet"))

    w(0, [0])
    w(2, [2])                      # seq 1 not visible yet
    tail_ingest(src, out, max_batches=1)
    w(1, [1])                      # late-visible lower seq
    r = tail_ingest(src, out, max_batches=1)
    assert r["rows_this_run"] == 1
    assert r["total_rows"] == 3


def test_windowed_resume_keyed_by_absolute_start(sf001, tmp_path):
    """A committed entry whose recorded window_start_us doesn't match the
    current window grid is treated as stale and re-processed."""
    out = str(tmp_path / "w5")
    run_windowed_ingest(f"{sf001}/events.parquet", out, resume=False,
                        max_windows=2)
    m = Manifest(out)
    ids = sorted(m.committed_ids())
    # corrupt one entry's recorded start (simulates a shifted stream)
    e = [x for x in m.entries() if x["partition_id"] == ids[0]][0]
    e["window_start_us"] += WINDOW_US
    m.commit(ids[0], e)
    res = run_windowed_ingest(f"{sf001}/events.parquet", out, resume=True,
                              max_windows=2)
    assert ids[0] not in res["skipped"]       # stale -> re-run
    assert ids[1] in res["skipped"]


def test_sliding_window_agg_edges():
    """Sliding windows: non-divisible window/hop and pre-1970 rows land
    in exactly the windows [wstart, wstart+window) covering them."""
    import pyarrow as pa
    import ray.data
    from go_distributed_log_search_ray.pipelines.streaming import (
        sliding_window_agg)

    # window=10, hop=4 (k=3, NOT divisible); ts=-1 exercises floor grid
    t = pa.table({"ts": pa.array([0, 5, 11, -1], pa.timestamp("us")),
                  "value": [1.0, 1.0, 1.0, 1.0]})
    out = sliding_window_agg(ray.data.from_arrow(t),
                             window_us=10, hop_us=4)
    got = {r["window_start_us"]: r["event_count"]
           for r in out.to_pylist()}
    want = {}
    for ts in (0, 5, 11, -1):
        w = ts // 4 * 4
        for j in range(3):
            s = w - 4 * j
            if s <= ts < s + 10:
                want[s] = want.get(s, 0) + 1
    assert got == want


def test_tail_windowed_watermark_routes_late_rows(tmp_path):
    """allowed_lateness: rows older than (max committed ts - lateness)
    at their poll go to the late/ side sink inside the same atomic
    batch; window totals exclude them; the watermark survives resume;
    the first batch (no watermark yet) never routes late."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.streaming import (
        tail_windowed_ingest, window_rows)

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(src)
    late_us = WINDOW_US  # 1-window lateness budget

    def emit(shard, seq, hours):
        ts = pa.array([h * WINDOW_US + 5 for h in hours],
                      pa.timestamp("us"))
        pq.write_table(pa.table({"ts": ts,
                                 "v": list(range(len(hours)))}),
                       os.path.join(src, f"{shard}_{seq:04d}.parquet"))

    # batch 0: no committed watermark -> nothing late, even old rows
    emit("s0", 0, [0, 5])
    r1 = tail_windowed_ingest(src, out, max_batches=1,
                              allowed_lateness_us=late_us)
    assert r1["window_rows"] == {0: 1, 5: 1}
    assert r1["late_rows"] == 0

    # batch 1: watermark = 5h+5us - 1h; hour-3 row is late, hour-5 ok
    emit("s0", 1, [3, 5])
    r2 = tail_windowed_ingest(src, out, max_batches=1,
                              allowed_lateness_us=late_us)
    assert r2["late_rows"] == 1
    assert window_rows(out) == {0: 1, 5: 2}

    # crash/resume: retire last entry; watermark recomputed from the
    # manifest gives the SAME split on redelivery
    m = Manifest(out)
    m.retire(1)
    r3 = tail_windowed_ingest(src, out, max_batches=1,
                              allowed_lateness_us=late_us)
    assert r3["late_rows"] == 1
    assert window_rows(out) == {0: 1, 5: 2}
    assert r3["total_rows"] == 3

    # late bytes actually exist in the side sink, with window ids
    import glob as g
    late_files = g.glob(os.path.join(out, "late", "b*", "*"))
    assert late_files
    late = pa.concat_tables([pq.read_table(f) for f in late_files])
    assert late.num_rows == 1
    assert late.column("window_id").to_pylist() == [3]

    # lateness OFF keeps the additive windows-stay-open behavior
    out2 = str(tmp_path / "out2")
    tail_windowed_ingest(src, out2, max_batches=2)
    assert window_rows(out2) == {0: 1, 3: 1, 5: 2}
