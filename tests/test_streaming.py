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
