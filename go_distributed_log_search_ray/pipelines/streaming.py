"""Streaming ingest analog: commit-interval windows over an event stream.

The reference's streaming mode cuts a segment every ``--commit-interval``
(processing-time tumbling windows, no watermarks/late-data handling --
/root/reference src/commands/index.go:107-122, args.go:134,162-163) with
at-least-once delivery (checkpoint saved AFTER segment upload,
kafka_checkpoint.go:108-138; crash between upload and checkpoint
re-indexes the window, SURVEY 2.10).

Ray Data re-expression: the "stream" is an ordered sequence of
event-time tumbling windows over a partitioned table -- a single parquet
file, a sharded directory, or an explicit file list (a real stream can
never fit one file).  Windows are consumed in CHUNKS of
``windows_per_job`` -- each chunk is ONE bounded Dataset job whose read
carries a pushed-down ``ts`` range filter (parquet row-group statistics
prune non-overlapping row groups ACROSS ALL FRAGMENTS), fans rows out to
per-window sink directories via a partitioned write, and then commits
each window atomically to the manifest.  Cost is
O(ceil(W / windows_per_job)) range scans -- with time-clustered row
groups (the normal layout for append-over-time log data) each scan
touches only its range's bytes -- instead of the O(W x full-scan) a
per-window rescan would pay.

Exactly-once: a window is either fully committed or invisible.  Manifest
entries are keyed by the ABSOLUTE window start (``wstart // window_us``),
not a positional index, so a stream that gains earlier events (or loses
files) between a crash and a resume cannot shift ids; resume re-verifies
``window_start_us`` on every skip.

``tail_windowed_ingest`` composes this with the growing-directory
source (the reference's actual streaming mode: Kafka partitions feeding
commit-interval segment cuts): each poll's new shard files are one
atomic batch whose rows are fanned out into per-window sink directories
under a batch-scoped root, so offsets (consumed files) and windowed data
commit together, exactly once.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state.manifest import Manifest

WINDOW_US = 3_600_000_000  # 1h tumbling window (commit-interval analog)

_NO_STATS = (-(1 << 62), 1 << 62)  # row group without ts stats: overlaps all


def _resolve_paths(events_path) -> list[str]:
    """A single file, a directory of parquet shards (recursive), or an
    explicit list of files -> ordered file list."""
    if isinstance(events_path, (list, tuple)):
        return list(events_path)
    if os.path.isdir(events_path):
        out = []
        for root, _, names in os.walk(events_path):
            out.extend(os.path.join(root, n) for n in names
                       if n.endswith(".parquet"))
        return sorted(out)
    return [events_path]


def _ts_footer_stats(events_path) -> tuple[int, int, int, list[tuple[int, int]]]:
    """(min_us, max_us, num_row_groups, per-row-group (min_us, max_us))
    across ALL fragments, from parquet FOOTER statistics only -- no data
    pages are read unless a writer omitted ts statistics, in which case
    that FILE's ts column is read once as the bounds fallback and its row
    groups are treated as overlapping every range."""
    import pyarrow.parquet as pq

    rgs: list[tuple[int, int]] = []
    bounds: list[tuple[int, int]] = []
    n_rg = 0
    for path in _resolve_paths(events_path):
        f = pq.ParquetFile(path)
        md = f.metadata
        ts_type = f.schema_arrow.field("ts").type
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index("ts")

        def us(v) -> int:
            return pa.scalar(v, type=ts_type).cast(pa.timestamp("us")).value

        missing = False
        for rg in range(md.num_row_groups):
            n_rg += 1
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                rgs.append(_NO_STATS)
                missing = True
            else:
                lo, hi = us(st.min), us(st.max)
                rgs.append((lo, hi))
                bounds.append((lo, hi))
        if missing:
            # stats-free writer: one bounded read of this file's ts column
            col = pq.read_table(path, columns=["ts"]).column("ts") \
                .cast(pa.timestamp("us"))
            mm = pc.min_max(col)
            if mm["min"].is_valid:
                bounds.append((mm["min"].value, mm["max"].value))
    if not bounds:
        raise ValueError(f"no ts values found in {events_path!r}")
    return (min(b[0] for b in bounds), max(b[1] for b in bounds),
            n_rg, rgs)


def window_bounds(events_path, window_us: int = WINDOW_US) -> list[int]:
    """Window starts spanning the stream's time range, derived from
    parquet footer min/max stats (the full ``ts`` column is never read
    unless a fragment lacks statistics)."""
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


def _window_counts_from_footers(root: str, wids) -> dict[int, int]:
    """Per-window row counts from ONE dataset listing + parquet footer
    metadata (no data pages, no per-window dataset constructions -- the
    naive per-window ``pads.dataset(wdir).count_rows()`` loop paid a
    listing per window and dominated wall time at 720 windows)."""
    import re
    import pyarrow.dataset as pads

    counts = {int(w): 0 for w in wids}
    if not os.path.isdir(root):
        return counts
    d = pads.dataset(root, format="parquet", partitioning="hive")
    pat = re.compile(r"window_id=(-?\d+)")
    for frag in d.get_fragments():
        m = pat.search(frag.path)
        if m:
            w = int(m.group(1))
            if w in counts:
                counts[w] += frag.metadata.num_rows
    return counts


def _tag_window(b: pa.Table, window_us: int) -> pa.Table:
    """Floor-division window ids (matches ``wstart // window_us``
    everywhere else even for pre-1970 negative-us timestamps; pc.divide
    truncates toward zero and would mis-bucket those rows)."""
    e = np.asarray(b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))
    return b.append_column("window_id", pa.array(e // window_us, pa.int64()))


def _adaptive_windows_per_job(events_path, n_windows: int,
                              target_rows: int = 500_000,
                              max_per_job: int = 168) -> int:
    """Windows per scan job sized to the stream's density: each bounded
    Dataset job carries ~1 s of fixed cost, so sparse streams (few rows
    per window) amortize it over many windows while dense streams keep
    jobs small to bound crash-loss.  Row counts come from parquet footer
    metadata only."""
    import pyarrow.parquet as pq
    total = sum(pq.ParquetFile(p).metadata.num_rows
                for p in _resolve_paths(events_path))
    per_window = max(1, total // max(1, n_windows))
    return max(1, min(max_per_job, target_rows // per_window))


def run_windowed_ingest(events_path, out_dir: str,
                        window_us: int = WINDOW_US,
                        resume: bool = True,
                        max_windows: int | None = None,
                        windows_per_job: int | None = None) -> dict:
    """Consume the stream (file, sharded directory, or file list); one
    committed manifest entry (and one sink directory) per window.
    ``windows_per_job`` bounds how much work a crash can lose (the
    commit-interval analog) while amortizing one pushed-down range scan
    over many windows; default adapts to stream density (see
    ``_adaptive_windows_per_job``)."""
    manifest = Manifest(out_dir)
    if not resume:
        manifest.drop()
        manifest = Manifest(out_dir)
    committed = {e["partition_id"]: e for e in manifest.entries()} if resume else {}

    paths = _resolve_paths(events_path)
    windows = window_bounds(paths, window_us)
    if max_windows is not None:
        windows = windows[:max_windows]
    if windows_per_job is None:
        windows_per_job = _adaptive_windows_per_job(paths, len(windows))

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

    _, _, rg_total, rg_stats = _ts_footer_stats(paths)
    import pyarrow.parquet as pq

    # metadata-free schema= keeps Ray's block-schema hashing clean (the
    # driver events tables are pandas-written; their schema metadata blob
    # is unhashable and triggers a per-block warning storm otherwise)
    schema = pq.ParquetFile(paths[0]).schema_arrow.remove_metadata()
    ts_type = schema.field("ts").type
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

        expr = ((pc.field("ts") >= pa.scalar(lo, type=pa.timestamp("us")).cast(ts_type))
                & (pc.field("ts") < pa.scalar(hi, type=pa.timestamp("us")).cast(ts_type)))

        wds = ray.data.read_parquet(paths, filter=expr, schema=schema) \
            .map_batches(lambda b: _tag_window(b, window_us),
                         batch_format="pyarrow")
        wds.write_parquet(sinks_root, partition_cols=["window_id"],
                          row_group_size=131072)

        job_counts = _window_counts_from_footers(
            sinks_root, [w // window_us for w in job])
        for wstart in job:
            wid = wstart // window_us
            n = job_counts.get(wid, 0)
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


# -- tail x windows composition --------------------------------------------


def sliding_window_agg(ds, window_us: int, hop_us: int,
                       value_col: str = "value",
                       ts_col: str = "ts") -> "pa.Table":
    """Sliding (hopping) event-time window aggregate: count + cent-sum of
    ``value_col`` per [wstart, wstart+window) window on a ``hop_us`` grid.

    Distributed shape: each row expands to its window/hop covering
    windows INSIDE ``map_batches`` (vectorized np.repeat -- the standard
    sliding-window expansion, factor = window/hop), partial per-batch
    sums shrink each block to O(windows-in-batch) rows, and one small
    groupby folds the partials.  The shuffle moves pre-aggregated
    (window, count, sum) rows only, never events."""
    from ray.data.aggregate import Sum

    k = (window_us + hop_us - 1) // hop_us      # windows covering a row

    def expand_partial(b: pa.Table) -> pa.Table:
        # null ts or value would cast to INT64_MIN / NaN and corrupt the
        # window sums -- drop such rows up front (matches the _cents
        # valid-filtering used by the tumbling-window path).
        valid = pc.and_(pc.is_valid(b.column(ts_col)),
                        pc.is_valid(b.column(value_col)))
        if not pc.all(valid).as_py():
            b = b.filter(valid)
        if b.num_rows == 0:
            return pa.table({"window_start_us": pa.array([], pa.int64()),
                             "event_count": pa.array([], pa.int64()),
                             "sum_value_cents": pa.array([], pa.int64())})
        ts = np.asarray(b.column(ts_col).cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        cents = np.floor(
            np.asarray(b.column(value_col), dtype=np.float64) * 100.0
        ).astype(np.int64)
        # last hop-aligned start covering the row, then k-1 earlier hops
        last = ts // hop_us * hop_us
        starts = (last[:, None]
                  - np.arange(k, dtype=np.int64)[None, :] * hop_us)
        covered = starts + window_us > ts[:, None]      # always true here
        # rows within window: wstart <= ts < wstart + window
        covered &= starts <= ts[:, None]
        w = starts[covered]
        c = np.repeat(cents, covered.sum(axis=1))
        t = pa.table({"window_start_us": pa.array(w),
                      "cents": pa.array(c)})
        g = t.group_by(["window_start_us"]).aggregate(
            [("cents", "count"), ("cents", "sum")])
        return g.rename_columns(
            ["window_start_us", "event_count", "sum_value_cents"])

    agg = ds.map_batches(expand_partial, batch_format="pyarrow") \
        .groupby("window_start_us").aggregate(
            Sum("event_count", alias_name="event_count"),
            Sum("sum_value_cents", alias_name="sum_value_cents"))
    from ..functions.tableops import small_table
    return small_table(agg, sort_keys=["window_start_us"],
                       int64_cols=["event_count", "sum_value_cents"]) \
        .select(["window_start_us", "event_count", "sum_value_cents"])


def tail_windowed_ingest(in_dir: str, out_dir: str,
                         window_us: int = WINDOW_US,
                         max_batches: int | None = None,
                         max_idle_polls: int = 3,
                         poll_interval_s: float = 0.2,
                         allowed_lateness_us: int | None = None) -> dict:
    """The reference's actual streaming mode (Kafka partitions feeding
    commit-interval cuts, src/commands/index.go:107-122): consume a
    GROWING directory of ``{shard}_{seq}.parquet`` files, fanning each
    poll batch's rows into per-window sink directories.

    Atomicity unit = the poll batch: its consumed files (the offsets)
    and its windowed rows commit in ONE manifest entry, under a
    batch-scoped sink root (``sinks/b{bid}/window_id=N``), so a crash
    between write and commit leaves only invisible files and resume
    redelivers exactly once.  A window's total = the sum over committed
    batches (windows stay open forever, like the reference's per-segment
    id-upserts: exactness is per batch, aggregation is additive).

    ``allowed_lateness_us`` (beyond-reference: the reference has no
    watermark/late-data semantics, index.go:107-122) turns on an
    event-time WATERMARK = max event ts across all COMMITTED batches
    minus the lateness budget.  Rows older than the watermark at their
    poll are routed to a ``late/`` side sink inside the same batch
    root and commit in the SAME manifest entry (``late_rows``), so the
    split inherits the batch's exactly-once unit; window totals then
    become final once the watermark passes them.  The watermark
    advances only on commit (stored per entry as ``max_ts``), so
    resume recomputes it exactly."""
    from ..sources.tail import DirectoryTailSource, committed_offsets

    manifest = Manifest(out_dir)
    seqs, bid = committed_offsets(manifest, "tail_window")
    src = DirectoryTailSource(in_dir, seqs)
    sinks_root = os.path.join(out_dir, "sinks")
    # watermark state: max event ts across committed batches (resume
    # recomputes it exactly from the manifest)
    max_ts_committed = max(
        (e["max_ts"] for e in manifest.entries()
         if e.get("kind") == "tail_window" and e.get("max_ts") is not None),
        default=None)

    batches = 0
    rows = 0
    idle = 0
    import time
    import pyarrow.dataset as pads
    while idle < max_idle_polls and (max_batches is None
                                     or batches < max_batches):
        files = src.poll()
        if not files:
            idle += 1
            time.sleep(poll_interval_s)
            continue
        idle = 0
        broot = os.path.join(sinks_root, f"b{bid:05d}")
        if os.path.isdir(broot):
            shutil.rmtree(broot)         # uncommitted leftovers: invisible
        batch_max_ts = _ts_footer_stats(files)[1]
        wm = (max_ts_committed - allowed_lateness_us
              if allowed_lateness_us is not None
              and max_ts_committed is not None else None)

        def split(b: pa.Table, late: bool) -> pa.Table:
            e = np.asarray(b.column("ts").cast(pa.timestamp("us"))
                           .cast(pa.int64()))
            m = e < wm
            return b.filter(pa.array(m if late else ~m))

        tagged = src.read(files).map_batches(
            lambda b: _tag_window(b, window_us), batch_format="pyarrow")
        n_late = 0
        if wm is not None:
            # side sink OUTSIDE sinks/ so window partition discovery
            # never sees late files; same crash semantics as broot
            late_dir = os.path.join(out_dir, "late", f"b{bid:05d}")
            if os.path.isdir(late_dir):
                shutil.rmtree(late_dir)
            tagged.map_batches(lambda b: split(b, True),
                               batch_format="pyarrow") \
                .write_parquet(late_dir, row_group_size=131072)
            n_late = int(pads.dataset(late_dir).count_rows()) \
                if os.path.isdir(late_dir) else 0
            tagged = src.read(files).map_batches(
                lambda b: split(_tag_window(b, window_us), False),
                batch_format="pyarrow")
        tagged.write_parquet(broot, partition_cols=["window_id"],
                             row_group_size=131072)
        wids = [int(d.split("=", 1)[1]) for d in
                (sorted(os.listdir(broot)) if os.path.isdir(broot) else [])
                if d.startswith("window_id=")]
        per_window = {w: n for w, n in
                      _window_counts_from_footers(broot, wids).items() if n}
        n = sum(per_window.values())
        manifest.commit(bid, {
            "kind": "tail_window",
            "shard_files": src.offsets(files),
            "window_us": window_us,
            "window_rows": {str(k): int(v) for k, v in per_window.items()},
            "row_count": int(n),
            "late_rows": int(n_late),
            "max_ts": int(batch_max_ts),
            "sinks": {f"batch={bid}": {"rows": int(n), "bytes": 0}},
            "metrics": {},
        })
        max_ts_committed = (batch_max_ts if max_ts_committed is None
                            else max(max_ts_committed, batch_max_ts))
        src.ack(files)
        rows += int(n)
        bid += 1
        batches += 1
    final_entries = [e for e in Manifest(out_dir).entries()
                     if e.get("kind") == "tail_window"]
    return {
        "batches_this_run": batches,
        "rows_this_run": rows,
        "window_rows": window_rows(out_dir),
        "total_rows": sum(e["row_count"] for e in final_entries),
        "late_rows": sum(e.get("late_rows", 0) for e in final_entries),
    }


def window_rows(out_dir: str) -> dict[int, int]:
    """Per-window totals folded across committed tail_window batches."""
    totals: dict[int, int] = {}
    for e in Manifest(out_dir).entries():
        if e.get("kind") != "tail_window":
            continue
        for k, v in e.get("window_rows", {}).items():
            totals[int(k)] = totals.get(int(k), 0) + int(v)
    return dict(sorted(totals.items()))
