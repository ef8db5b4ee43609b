"""Commit-interval window ingest (streaming analog, SURVEY 2.10):
window cut, per-window commit, exactly-once resume."""

import duckdb
import pytest

from go_distributed_log_search_ray.pipelines.streaming import (
    run_windowed_ingest, window_bounds)
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
    assert sum(e["row_count"] for e in entries) > 0


def test_windowed_resume_skips_committed(sf001, tmp_path):
    out = str(tmp_path / "w2")
    run_windowed_ingest(f"{sf001}/events.parquet", out, resume=False,
                        max_windows=3)
    res = run_windowed_ingest(f"{sf001}/events.parquet", out, resume=True,
                              max_windows=6)
    assert res["skipped"] == [0, 1, 2]
    # exactly-once: totals equal an uninterrupted 6-window run
    fresh = str(tmp_path / "w3")
    res2 = run_windowed_ingest(f"{sf001}/events.parquet", fresh, resume=False,
                               max_windows=6)
    assert res["total_rows"] == res2["total_rows"]
