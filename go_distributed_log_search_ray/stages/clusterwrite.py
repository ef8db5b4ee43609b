"""Range-clustered Parquet output with a pruning manifest.

Sorting a 100 TB output is only half the win -- the LAYOUT must let
the NEXT job skip data.  ``write_clustered`` range-partitions by a key
(sampled (key, id) boundaries, hot keys split by the id tiebreak),
sorts within each partition, writes ONE file per partition, and
records a JSON manifest of per-file [min_key, max_key] ranges;
``read_clustered`` then serves a key-range query by opening ONLY the
overlapping files.  This is the clustered-table / zone-map pattern
(and the resumable-output rule: per-partition files + ``_SUCCESS``
marker, re-runs skip completed work).

Files are written task-side (each range partition's ``map_groups``
task writes its own file) so nothing funnels through the driver; on a
real cluster the directory is an object-store URI via ``pyarrow.fs``,
exactly like ``state/manifest.py``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from .partitions import num_partitions as _default_partitions
from .sortrank import _lex_searchsorted, _np, sample_boundaries


def zorder_key(x: pa.Array | pa.ChunkedArray,
               y: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Interleave the low 31 bits of two non-negative int columns into
    one int64 Morton (Z-order) key: range-clustering on this key keeps
    BOTH dimensions' per-file zone maps tight, so a 2-D box query
    prunes files on either dimension (the Delta/Iceberg Z-ORDER BY
    layout trick).  Raises on values outside [0, 2^31)."""
    xs = _np(x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x)
    ys = _np(y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y)
    for v in (xs, ys):
        if len(v) and (v.min() < 0 or v.max() >= (1 << 31)):
            raise ValueError("zorder_key inputs must lie in [0, 2^31)")

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    z = spread(xs) | (spread(ys) << np.uint64(1))
    return pa.array(z.astype(np.int64))


def zorder_key_n(cols: list[pa.Array | pa.ChunkedArray]) -> pa.Array:
    """N-dimensional Morton key: round-robin bit interleaving of 2-8
    non-negative int columns into one int64 (each column contributes
    ``63 // n`` low bits; values outside that range raise).  The 2-D
    fast path delegates to ``zorder_key``; higher dimensions use a
    per-bit gather loop (n x bits iterations of whole-column numpy
    ops -- vectorized over rows, not a row loop)."""
    n = len(cols)
    if n == 2:
        return zorder_key(cols[0], cols[1])
    if not 2 <= n <= 8:
        raise ValueError("zorder_key_n supports 2-8 columns")
    bits = 63 // n
    vs = []
    for c in cols:
        v = _np(c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                else c)
        if len(v) and (v.min() < 0 or v.max() >= (1 << bits)):
            raise ValueError(
                f"zorder_key_n: values must lie in [0, 2^{bits})")
        vs.append(v.astype(np.uint64))
    z = np.zeros(len(vs[0]) if vs else 0, np.uint64)
    for b in range(bits):
        for j, v in enumerate(vs):
            z |= ((v >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(b * n + j)
    return pa.array(z.astype(np.int64))


def write_clustered(ds: Dataset, out_dir: str, key: str, id_col: str,
                    num_partitions: int | None = None,
                    est_bytes: int | None = None,
                    stats_cols: list[str] | None = None) -> str:
    """Write ``ds`` as range-clustered parquet under ``out_dir``;
    returns the dir.  Idempotent via ``_SUCCESS`` (a completed write is
    never redone; a torn write is redone from scratch).

    ``stats_cols``: extra int columns whose per-file [min, max] are
    recorded in the manifest -- multi-dimension zone maps.  With a
    ``zorder_key`` cluster key these stay tight on EVERY interleaved
    dimension, enabling ``read_clustered_box`` pruning."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    stats_cols = list(stats_cols or [])
    p = num_partitions or _default_partitions(est_bytes)
    bkeys, bids = sample_boundaries(ds, key, id_col, p)

    def assign(b: pa.Table) -> pa.Table:
        part = _lex_searchsorted(bkeys, bids,
                                 _np(b.column(key)), _np(b.column(id_col)))
        return b.append_column("__part", pa.array(part, pa.int64()))

    man_schema = pa.schema([("part", pa.int64()), ("path", pa.string()),
                            ("min_key", pa.int64()),
                            ("max_key", pa.int64()),
                            ("n_rows", pa.int64()),
                            ("stats", pa.string())])

    def write_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return man_schema.empty_table()
        pid = int(t.column("__part")[0].as_py())
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx).drop_columns(["__part"])
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        pq.write_table(t, path)
        k = t.column(key)
        stats = {c: [pc.min(t.column(c)).as_py(),
                     pc.max(t.column(c)).as_py()] for c in stats_cols}
        return pa.table({"part": pa.array([pid], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "min_key": pa.array([pc.min(k).as_py()],
                                             pa.int64()),
                         "max_key": pa.array([pc.max(k).as_py()],
                                             pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64()),
                         "stats": pa.array([json.dumps(stats)],
                                           pa.string())},
                        schema=man_schema)

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__part").map_groups(write_part, batch_format="pyarrow") \
        .take_all()
    manifest = [dict(r, stats=json.loads(r.get("stats") or "{}"))
                for r in manifest]
    with open(os.path.join(out_dir, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(sorted(manifest, key=lambda r: r["part"]), f)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("ok")
    return out_dir


def pruned_files(out_dir: str, lo=None, hi=None) -> list[str]:
    """Manifest entries overlapping [lo, hi) -- the zone-map prune."""
    with open(os.path.join(out_dir, "manifest.json"),
              encoding="utf-8") as f:
        man = json.load(f)
    out = []
    for r in man:
        if lo is not None and r["max_key"] < lo:
            continue
        if hi is not None and r["min_key"] >= hi:
            continue
        out.append(r["path"])
    return out


def read_clustered(out_dir: str, lo=None, hi=None,
                   columns=None) -> Dataset:
    """Dataset over ONLY the files whose key range overlaps [lo, hi);
    rows still need the residual filter (file ranges are coarse)."""
    import ray.data

    files = pruned_files(out_dir, lo, hi)
    if not files:
        # typed empty: read zero rows via an empty filter on one file
        with open(os.path.join(out_dir, "manifest.json"),
                  encoding="utf-8") as f:
            man = json.load(f)
        if not man:
            raise FileNotFoundError(f"empty clustered dir {out_dir}")
        return ray.data.read_parquet(man[0]["path"], columns=columns) \
            .limit(0)
    return ray.data.read_parquet(files, columns=columns)


def merge_join_clustered(dir_a: str, dir_b: str, key: str,
                         columns_a=None, columns_b=None) -> Dataset:
    """SHUFFLE-FREE equi-join of two range-clustered tables: when both
    sides were written by ``write_clustered`` on the join key, each
    A file's key range selects the overlapping B files from B's zone
    manifest, and one task joins that pair -- no hash exchange of
    either side, the classic co-clustered merge-join plan.

    Correctness under boundary overlap: every A row lives in exactly
    one A file and every B row in exactly one B file, and a task reads
    ALL B files overlapping its A file's range, so each (a, b) pair is
    produced exactly once even when a hot key straddles partition
    boundaries (B-side filtered to the A range before the join keeps
    the task's memory bounded by the range, not the file).

    Scale shape: the task list is the A manifest (metadata only);
    read amplification is bounded by B files per A range (1-2 for
    similar partition counts).  Skewed hot keys cost re-reads of the
    hot B file, never a shuffle."""
    import ray.data

    with open(os.path.join(dir_a, "manifest.json"), encoding="utf-8") as f:
        man_a = json.load(f)
    with open(os.path.join(dir_b, "manifest.json"), encoding="utf-8") as f:
        man_b = json.load(f)
    man_b = sorted(man_b, key=lambda r: r["min_key"])

    def task(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            a = pq.read_table(row["path"], columns=columns_a)
            lo, hi = row["min_key"], row["max_key"]
            b_files = [r["path"] for r in man_b
                       if r["max_key"] >= lo and r["min_key"] <= hi]
            if not b_files or a.num_rows == 0:
                continue
            b = pa.concat_tables(
                [pq.read_table(p, columns=columns_b) for p in b_files])
            b = b.filter(pc.and_(pc.greater_equal(b.column(key), lo),
                                 pc.less_equal(b.column(key), hi)))
            if b.num_rows == 0:
                continue
            out.append(a.join(b, keys=[key], join_type="inner"))
        if not out:
            return None
        return pa.concat_tables(out, promote_options="default")

    tasks = ray.data.from_arrow(
        pa.table({"path": pa.array([r["path"] for r in man_a]),
                  "min_key": pa.array([r["min_key"] for r in man_a],
                                      pa.int64()),
                  "max_key": pa.array([r["max_key"] for r in man_a],
                                      pa.int64())}))

    empty = _empty_like(dir_a, key, columns_a, dir_b, columns_b)
    return tasks.map_batches(lambda b: task(b) or empty,
                             batch_size=1, batch_format="pyarrow")


def _empty_like(dir_a, key, columns_a, dir_b, columns_b) -> pa.Table:
    """Zero-row table with the joined schema (for empty task outputs)."""
    with open(os.path.join(dir_a, "manifest.json"), encoding="utf-8") as f:
        pa_path = json.load(f)[0]["path"]
    with open(os.path.join(dir_b, "manifest.json"), encoding="utf-8") as f:
        pb_path = json.load(f)[0]["path"]
    a = pq.read_table(pa_path, columns=columns_a).slice(0, 0)
    b = pq.read_table(pb_path, columns=columns_b).slice(0, 0)
    return a.join(b, keys=[key], join_type="inner")


def merge_clustered(out_dir: str, delta: Dataset, key: str,
                    id_col: str, op_col: str | None = None) -> dict:
    """Copy-on-write MERGE of a CDC delta into a clustered table: only
    the files whose key range the delta touches are rewritten; the new
    manifest is swapped in atomically (``os.replace``), so a torn run
    leaves the ORIGINAL table fully readable and a rerun of the same
    delta converges (upsert/delete are idempotent re-applied).

    Semantics: each delta row UPSERTS by ``id_col`` (every base row
    with that id is removed, the delta row inserted) unless ``op_col``
    says ``"delete"`` (removed, nothing inserted).  Duplicate ids
    within one delta are ambiguous and raise.  The delta must carry
    every base column (after a ``backfill_column_clustered`` the base
    schema is wider -- widen the delta the same way or the upsert
    raises rather than silently nulling backfilled values).  The id->file lookup
    uses the delta row's ``key``, so the cluster key of a given id
    must be immutable across upserts -- automatic when the table is
    clustered on the id itself (the primary-key layout this engine's
    demo uses); a key-changing upsert needs a delete+insert pair.

    Scale shape: the delta moves once (one ``groupby(__part)``
    shuffle over DELTA rows only); each touched file is read and
    rewritten by its own task; untouched files -- the overwhelming
    majority under zone-map locality -- are carried over as manifest
    rows without being opened.  Boundary-straddling keys (a hot key
    split across two files by the id tiebreak) fan the removal out to
    EVERY overlapping file; the insert lands in exactly one.

    Returns ``{"rewritten": n, "carried": m, "gen": g}``.
    """
    import re

    import ray.data

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as f:
        man = json.load(f)
    if not man:
        raise FileNotFoundError(f"empty clustered dir {out_dir}")
    man = sorted(man, key=lambda r: (r["min_key"], r["part"]))
    min_keys = np.array([r["min_key"] for r in man], np.int64)
    max_keys = np.array([r["max_key"] for r in man], np.int64)
    paths = {i: r["path"] for i, r in enumerate(man)}
    stats_cols = {i: sorted((r.get("stats") or {}).keys())
                  for i, r in enumerate(man)}
    gen = 1 + max((int(m.group(1)) for p in paths.values()
                   for m in [re.search(r"-g(\d+)\.parquet$", p)] if m),
                  default=0)
    n_parts = len(man)

    def assign(b: pa.Table) -> pa.Table:
        """Fan each delta row out to every overlapping file slot;
        mark exactly one slot (__ins) as the insert target."""
        k = _np(b.column(key)).astype(np.int64)
        first = np.searchsorted(max_keys, k, side="left")
        last = np.searchsorted(min_keys, k, side="right") - 1
        # gap / out-of-range keys: nearest single slot
        last = np.clip(last, 0, n_parts - 1)
        first = np.minimum(np.clip(first, 0, n_parts - 1), last)
        reps = (last - first + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(k)), reps)
        slot = np.concatenate(
            [np.arange(f, l + 1) for f, l in zip(first, last)]
        ).astype(np.int64) if len(k) else np.empty(0, np.int64)
        ins = slot == np.repeat(last, reps)
        t = b.take(pa.array(row_idx))
        return t.append_column("__part", pa.array(slot)) \
                .append_column("__ins", pa.array(ins))

    out_schema = pa.schema([("part", pa.int64()), ("slot", pa.int64()),
                            ("path", pa.string()),
                            ("min_key", pa.int64()),
                            ("max_key", pa.int64()),
                            ("n_rows", pa.int64()),
                            ("stats", pa.string())])

    def rewrite(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        slot = int(t.column("__part")[0].as_py())
        ins_mask = t.column("__ins")
        inserts = t.filter(ins_mask)
        # duplicate-id guard BEFORE the delete filter: a delta carrying
        # both an upsert and a delete for one id is just as ambiguous
        # as two upserts -- validating after dropping deletes would let
        # the upsert silently win instead of raising
        ids = inserts.column(id_col)
        uniq = pc.count_distinct(ids).as_py()
        if uniq != inserts.num_rows:
            raise ValueError(
                f"merge delta has duplicate {id_col} values in one "
                f"partition (slot {slot}): ambiguous upsert order")
        if op_col is not None:
            keep = pc.not_equal(
                pc.fill_null(inserts.column(op_col), "upsert"),
                pa.scalar("delete"))
            inserts = inserts.filter(keep)
            inserts = inserts.drop_columns([op_col])
        inserts = inserts.drop_columns(["__part", "__ins"])
        all_ids = t.column(id_col)  # removals: every delta id, any op
        base = pq.read_table(paths[slot])
        base = base.filter(
            pc.invert(pc.fill_null(pc.is_in(base.column(id_col),
                                            value_set=all_ids.combine_chunks()
                                            if isinstance(all_ids,
                                                          pa.ChunkedArray)
                                            else all_ids), False)))
        merged = pa.concat_tables(
            [base, inserts.select(base.schema.names).cast(base.schema)],
            promote_options="default")
        idx = pc.sort_indices(merged, sort_keys=[(key, "ascending"),
                                                 (id_col, "ascending")])
        merged = merged.take(idx)
        pid = man[slot]["part"]
        path = os.path.join(out_dir, f"part-{pid:05d}-g{gen:03d}.parquet")
        pq.write_table(merged, path)
        k = merged.column(key)
        empty = merged.num_rows == 0
        stats = {c: [pc.min(merged.column(c)).as_py(),
                     pc.max(merged.column(c)).as_py()]
                 for c in stats_cols[slot]} if not empty else {}
        return pa.table({"part": pa.array([pid], pa.int64()),
                         "slot": pa.array([slot], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "min_key": pa.array(
                             [None if empty else pc.min(k).as_py()],
                             pa.int64()),
                         "max_key": pa.array(
                             [None if empty else pc.max(k).as_py()],
                             pa.int64()),
                         "n_rows": pa.array([merged.num_rows],
                                            pa.int64()),
                         "stats": pa.array([json.dumps(stats)],
                                           pa.string())},
                        schema=out_schema)

    new_rows = delta.map_batches(assign, batch_format="pyarrow") \
        .groupby("__part").map_groups(rewrite, batch_format="pyarrow") \
        .take_all()
    touched = {int(r["slot"]) for r in new_rows}
    new_man = [dict(part=r["part"], path=r["path"],
                    min_key=r["min_key"], max_key=r["max_key"],
                    n_rows=r["n_rows"],
                    stats=json.loads(r.get("stats") or "{}"))
               for r in new_rows if r["n_rows"] > 0]
    dropped_empty = [r["path"] for r in new_rows if r["n_rows"] == 0]
    carried = [r for i, r in enumerate(man) if i not in touched]
    new_man.extend(carried)
    tmp = man_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(sorted(new_man, key=lambda r: r["part"]), f)
    os.replace(tmp, man_path)  # atomic swap: readers never see a tear
    for i in touched:          # superseded only after the swap landed
        try:
            os.unlink(paths[i])
        except OSError:
            pass
    for p in dropped_empty:
        try:
            os.unlink(p)
        except OSError:
            pass
    return {"rewritten": len(touched), "carried": len(carried),
            "gen": gen}


def pruned_files_box(out_dir: str,
                     box: dict[str, tuple]) -> tuple[list[str], int]:
    """Files whose recorded stats can intersect EVERY ``col: (lo, hi)``
    half-open range in ``box`` (multi-dimension zone-map prune).
    Returns (paths, total_file_count) so callers can assert/report the
    prune ratio."""
    with open(os.path.join(out_dir, "manifest.json"),
              encoding="utf-8") as f:
        man = json.load(f)
    out = []
    for r in man:
        st = r.get("stats") or {}
        keep = True
        for col, (lo, hi) in box.items():
            mn, mx = st[col]
            if (lo is not None and mx < lo) or \
               (hi is not None and mn >= hi):
                keep = False
                break
        if keep:
            out.append(r["path"])
    return out, len(man)


def read_clustered_box(out_dir: str, box: dict[str, tuple],
                       columns=None) -> Dataset:
    """Dataset over ONLY the files overlapping a multi-dimension box;
    rows still need the residual per-row filter (zone maps are coarse).
    With a ``zorder_key`` layout, pruning bites on every interleaved
    dimension instead of just the leading sort column."""
    import ray.data

    files, total = pruned_files_box(out_dir, box)
    if not files:
        with open(os.path.join(out_dir, "manifest.json"),
                  encoding="utf-8") as f:
            man = json.load(f)
        if not man:
            raise FileNotFoundError(f"empty clustered dir {out_dir}")
        return ray.data.read_parquet(man[0]["path"], columns=columns) \
            .limit(0)
    return ray.data.read_parquet(files, columns=columns)


def backfill_column_clustered(out_dir: str, col: str, fn,
                              columns: list[str] | None = None) -> dict:
    """Copy-on-write column BACKFILL: add a derived column to every
    file of a clustered table without touching rows, keys, or stats.
    ``fn(table) -> pa.Array`` computes the new column from each file's
    existing columns (``columns`` prunes what is read into ``fn``'s
    view; the full file is still rewritten alongside the new column).

    Idempotent per FILE: files already carrying ``col`` are skipped,
    so a crashed backfill resumes where it stopped (the schema itself
    is the progress marker) -- and the manifest swap per file is an
    atomic rename, so readers never see a torn file.

    Scale shape: one task per file, no shuffle, no driver data; the
    only driver traffic is the O(files) path list."""
    import ray.data

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path, encoding="utf-8") as f:
        man = json.load(f)

    def per_file(b: pa.Table) -> pa.Table:
        done, skipped = [], []
        for path in b.column("path").to_pylist():
            pf = pq.ParquetFile(path)
            if col in pf.schema_arrow.names:
                skipped.append(path)
                continue
            t = pq.read_table(path)
            view = t.select(columns) if columns else t
            arr = fn(view)
            t = t.append_column(col, arr)
            tmp = path + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, path)       # atomic per-file swap
            done.append(path)
        return pa.table({"path": pa.array(done + skipped),
                         "skipped": pa.array([False] * len(done)
                                             + [True] * len(skipped))})

    rows = ray.data.from_arrow(pa.table(
        {"path": pa.array([r["path"] for r in man])})) \
        .map_batches(per_file, batch_size=1, batch_format="pyarrow") \
        .take_all()
    n_done = sum(1 for r in rows if not r["skipped"])
    return {"rewritten": n_done,
            "skipped": sum(1 for r in rows if r["skipped"])}


def vacuum_clustered(out_dir: str) -> dict:
    """Garbage-collect orphan files a torn merge left behind: any
    ``part-*.parquet`` under the directory that the CURRENT manifest
    does not reference (e.g. new-generation files written before a
    crash that happened ahead of the manifest swap), plus stale
    ``manifest.json.tmp``.  Never touches referenced files, so it is
    safe to run at any time; returns what it removed."""
    import glob as _glob

    with open(os.path.join(out_dir, "manifest.json"),
              encoding="utf-8") as f:
        live = {r["path"] for r in json.load(f)}
    removed = []
    for p in _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        if p not in live:
            try:
                os.unlink(p)
                removed.append(p)
            except OSError:
                pass
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    if os.path.exists(tmp):
        try:
            os.unlink(tmp)
            removed.append(tmp)
        except OSError:
            pass
    return {"removed": len(removed), "paths": sorted(removed)}
