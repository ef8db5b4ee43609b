"""Streaming ingest analog: commit-interval windows over an event stream.

The reference's streaming mode cuts a segment every ``--commit-interval``
(processing-time tumbling windows, no watermarks/late-data handling --
/root/reference src/commands/index.go:107-122, args.go:134,162-163) with
at-least-once delivery (checkpoint saved AFTER segment upload,
kafka_checkpoint.go:108-138; crash between upload and checkpoint
re-indexes the window, SURVEY 2.10).

Ray Data re-expression: the "stream" is an ordered sequence of
event-time tumbling windows over a partitioned table; windows are
consumed in CHUNKS of ``windows_per_job`` -- each chunk is ONE bounded
Dataset job whose read carries a pushed-down ``ts`` range filter
(parquet row-group statistics prune non-overlapping row groups), fans
rows out to per-window sink directories via a partitioned write, and
then commits each window atomically to the manifest.  Cost is
O(ceil(W / windows_per_job)) range scans -- with time-clustered row
groups (the normal layout for append-over-time log data) each scan
touches only its range's bytes -- instead of the O(W x full-scan) a
per-window rescan would pay.

Exactly-once: a window is either fully committed or invisible.  Manifest
entries are keyed by the ABSOLUTE window start (``wstart // window_us``),
not a positional index, so a stream that gains earlier events (or loses
files) between a crash and a resume cannot shift ids; resume re-verifies
``window_start_us`` on every skip.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state.manifest import Manifest

WINDOW_US = 3_600_000_000  # 1h tumbling window (commit-interval analog)


def _ts_footer_stats(events_path: str) -> tuple[int, int, int, list[tuple[int, int]]]:
    """(min_us, max_us, num_row_groups, per-row-group (min_us, max_us))
    from parquet FOOTER statistics only -- no data pages are read."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(events_path)
    md = f.metadata
    ts_type = f.schema_arrow.field("ts").type
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    idx = names.index("ts")

    def us(v) -> int:
        return pa.scalar(v, type=ts_type).cast(pa.timestamp("us")).value

    rgs = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        rgs.append((us(st.min), us(st.max)))
    return min(r[0] for r in rgs), max(r[1] for r in rgs), md.num_row_groups, rgs


def window_bounds(events_path: str, window_us: int = WINDOW_US) -> list[int]:
    """Window starts spanning the stream's time range, derived from
    parquet footer min/max stats (the full ``ts`` column is never read)."""
    lo_us, hi_us, _, _ = _ts_footer_stats(events_path)
    lo = lo_us // window_us * window_us
    hi = hi_us // window_us * window_us
    return list(range(lo, hi + window_us, window_us))


def _chunk_contiguous(wstarts: list[int], window_us: int,
                      per_job: int) -> list[list[int]]:
    """Group uncommitted window starts into contiguous runs, then chunk
    each run to at most ``per_job`` windows (one range-scan job each)."""
    jobs: list[list[int]] = []
    run: list[int] = []
    for w in wstarts:
        if run and w != run[-1] + window_us:
            jobs.append(run)
            run = []
        run.append(w)
        if len(run) == per_job:
            jobs.append(run)
            run = []
    if run:
        jobs.append(run)
    return jobs


def run_windowed_ingest(events_path: str, out_dir: str,
                        window_us: int = WINDOW_US,
                        resume: bool = True,
                        max_windows: int | None = None,
                        windows_per_job: int = 24) -> dict:
    """Consume the stream; one committed manifest entry (and one sink
    directory) per window.  ``windows_per_job`` bounds how much work a
    crash can lose (the commit-interval analog) while amortizing one
    pushed-down range scan over many windows."""
    manifest = Manifest(out_dir)
    if not resume:
        manifest.drop()
        manifest = Manifest(out_dir)
    committed = {e["partition_id"]: e for e in manifest.entries()} if resume else {}

    windows = window_bounds(events_path, window_us)
    if max_windows is not None:
        windows = windows[:max_windows]

    done: list[int] = []
    todo: list[int] = []
    for wstart in windows:
        wid = wstart // window_us
        e = committed.get(wid)
        # verify the absolute start on skip: a stale entry whose recorded
        # window no longer matches is re-processed, never trusted
        if e is not None and e.get("window_start_us") == wstart \
                and e.get("window_us") == window_us:
            done.append(wid)
        else:
            todo.append(wstart)

    _, _, rg_total, rg_stats = _ts_footer_stats(events_path)
    import pyarrow.dataset as pads

    ts_type = None
    sinks_root = os.path.join(out_dir, "sinks")
    processed = 0
    rg_scanned = 0
    jobs = _chunk_contiguous(todo, window_us, windows_per_job)
    for job in jobs:
        lo, hi = job[0], job[-1] + window_us
        # honest scan accounting from the same footer stats arrow uses:
        # row groups whose [min,max] overlaps [lo,hi)
        rg_scanned += sum(1 for mn, mx in rg_stats if mx >= lo and mn < hi)
        for wstart in job:
            wdir = os.path.join(sinks_root, f"window_id={wstart // window_us}")
            if os.path.isdir(wdir):
                shutil.rmtree(wdir)      # uncommitted leftovers: invisible

        if ts_type is None:
            import pyarrow.parquet as pq
            ts_type = pq.ParquetFile(events_path).schema_arrow.field("ts").type
        expr = ((pc.field("ts") >= pa.scalar(lo, type=pa.timestamp("us")).cast(ts_type))
                & (pc.field("ts") < pa.scalar(hi, type=pa.timestamp("us")).cast(ts_type)))

        def tag_window(b: pa.Table) -> pa.Table:
            e = pc.cast(b.column("ts"), pa.int64())
            wid_col = pc.divide(e, pa.scalar(window_us))
            return b.append_column("window_id", pc.cast(wid_col, pa.int64()))

        wds = ray.data.read_parquet(events_path, filter=expr) \
            .map_batches(tag_window, batch_format="pyarrow")
        wds.write_parquet(sinks_root, partition_cols=["window_id"],
                          row_group_size=131072)

        for wstart in job:
            wid = wstart // window_us
            wdir = os.path.join(sinks_root, f"window_id={wid}")
            n = pads.dataset(wdir, format="parquet").count_rows() \
                if os.path.isdir(wdir) else 0
            manifest.commit(wid, {
                "window_start_us": wstart,
                "window_us": window_us,
                "row_count": int(n),
                "sinks": {f"window={wstart}": {"rows": int(n), "bytes": 0}},
                "metrics": {},
            })
            processed += int(n)

    return {
        "windows": len(windows),
        "jobs": len(jobs),
        "skipped": sorted(done),
        "rows_processed_this_run": processed,
        "row_groups_scanned": rg_scanned,
        "row_groups_total": rg_total,
        "total_rows": sum(e["row_count"] for e in manifest.entries()),
    }
