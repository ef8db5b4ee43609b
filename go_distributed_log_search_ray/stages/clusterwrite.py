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


def write_clustered(ds: Dataset, out_dir: str, key: str, id_col: str,
                    num_partitions: int | None = None,
                    est_bytes: int | None = None) -> str:
    """Write ``ds`` as range-clustered parquet under ``out_dir``;
    returns the dir.  Idempotent via ``_SUCCESS`` (a completed write is
    never redone; a torn write is redone from scratch)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    p = num_partitions or _default_partitions(est_bytes)
    bkeys, bids = sample_boundaries(ds, key, id_col, p)

    def assign(b: pa.Table) -> pa.Table:
        part = _lex_searchsorted(bkeys, bids,
                                 _np(b.column(key)), _np(b.column(id_col)))
        return b.append_column("__part", pa.array(part, pa.int64()))

    man_schema = pa.schema([("part", pa.int64()), ("path", pa.string()),
                            ("min_key", pa.int64()),
                            ("max_key", pa.int64()),
                            ("n_rows", pa.int64())])

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
        return pa.table({"part": pa.array([pid], pa.int64()),
                         "path": pa.array([path], pa.string()),
                         "min_key": pa.array([pc.min(k).as_py()],
                                             pa.int64()),
                         "max_key": pa.array([pc.max(k).as_py()],
                                             pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64())},
                        schema=man_schema)

    manifest = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("__part").map_groups(write_part, batch_format="pyarrow") \
        .take_all()
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
