"""SoftDeDup: duplicate-frequency reweighting instead of removal.

Public-knowledge method (She et al., "SoftDedup: an Efficient Data
Reweighting Method for Speeding Up Language Model Pre-training",
ACL 2024): rather than DROP duplicated documents, downweight each by
its "commonness" -- here the count ``c`` of corpus documents sharing
its normalized-text fingerprint, sampled/weighted at ``1/c`` so every
duplicate CLASS contributes one document's worth of gradient mass
while unique text keeps full weight.  Removal (``dedup.exact_dedup``)
is the degenerate hard cut; soft weights preserve the distributional
tail that hard dedup destroys.

Fingerprints reuse the exact-dedup convention: md5 of the canonical
normalization (lower + whitespace collapse + trim,
``textstats.normalize_text_batch`` -- SQL twin
``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``).  Null text
never groups with other nulls: it fingerprint-sentinels to
``null#<doc_id>`` (dup_count 1), matching the SQL ``CASE WHEN text IS
NULL`` arm -- a missing payload is not a duplicate class.

Weights stay integer-exact end to end: the per-class weight is
reported as ``weight_ppm = 1_000_000 // dup_count`` (parts-per-million
fixed point, DuckDB ``//``), and the aggregate groups by
``(group, dup_count)`` so no float ever enters the comparison.

Scale shape (100 TB):

* ``commonness_agg`` never shuffles the payload: one narrow projection
  ``(fingerprint, group, size)`` feeds a single fingerprint-hash
  exchange, and each fingerprint group folds to O(groups-in-class)
  partial rows -- the output is O(distinct (group, dup_count)), tiny.
* ``soft_weights`` attaches per-ROW weights, which genuinely requires
  co-locating each class once: one corpus shuffle by fingerprint, the
  same exchange cost as ``exact_dedup`` (no broadcast of the dup-class
  set, which at web scale is NOT small).

Reference analog: the reference dedups segments exactly at ingest
(SURVEY.md 2.7); soft weighting is the pretraining-corpus refinement
of that rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from .textstats import normalize_text_batch

WEIGHT_SCALE = 1_000_000

_PARTIAL = pa.schema([("group", pa.string()), ("dup_count", pa.int64()),
                      ("n_docs", pa.int64()), ("sum_size", pa.int64())])


def _fingerprints(b: pa.Table, text_col: str, id_col: str) -> pa.Array:
    """md5-hex of normalized text; null text -> ``null#<id>`` sentinel
    (unique per row, so nulls never form a duplicate class)."""
    norm = normalize_text_batch(b.select([text_col]), text_col=text_col) \
        .column("text_norm")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    ids = b.column(id_col).cast(pa.string()).to_pylist()
    md5 = hashlib.md5
    return pa.array(
        [f"null#{i}" if v is None else md5(v).hexdigest()
         for v, i in zip(norm.cast(pa.binary()).to_pylist(), ids)],
        type=pa.string())


def commonness_agg(ds: Dataset, text_col: str = "text",
                   id_col: str = "doc_id", group_col: str = "lang",
                   size_col: str = "n_chars") -> Dataset:
    """Per ``(group, dup_count)``: document count and size sum, where
    ``dup_count`` is the corpus-wide size of each row's normalized
    duplicate class.  SQL twin: ``count(*) OVER (PARTITION BY fp)``
    then ``GROUP BY group, dup_count``.  Payload never shuffles."""

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "fp": _fingerprints(b, text_col, id_col),
            "group": b.column(group_col).cast(pa.string()),
            "size": b.column(size_col).cast(pa.int64())})

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return _PARTIAL.empty_table()
        c = g.num_rows
        t = pa.table({"group": g.column("group"),
                      "n_docs": pa.array(np.ones(c, np.int64)),
                      "sum_size": g.column("size")})
        p = t.group_by(["group"]).aggregate(
            [("n_docs", "sum"), ("sum_size", "sum")])
        p = p.rename_columns(["group", "n_docs", "sum_size"])
        return pa.table({
            "group": p.column("group"),
            "dup_count": pa.array(
                np.full(p.num_rows, c, np.int64)),
            "n_docs": p.column("n_docs").cast(pa.int64()),
            "sum_size": p.column("sum_size").cast(pa.int64())},
            schema=_PARTIAL)

    partials = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("fp").map_groups(fold, batch_format="pyarrow")
    return partials.groupby(["group", "dup_count"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_size", alias_name="sum_size"))


def soft_weights(ds: Dataset, text_col: str = "text",
                 id_col: str = "doc_id",
                 scale: int = WEIGHT_SCALE) -> Dataset:
    """Append ``dup_count`` (int64) and ``weight_ppm = scale //
    dup_count`` to every row: the SoftDeDup sampling weight in fixed
    point.  One corpus shuffle by fingerprint (exact-dedup cost); all
    input columns ride through."""

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("__fp", _fingerprints(b, text_col, id_col))

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return None  # replaced below: schema known only at runtime
        c = g.num_rows
        g = g.drop_columns(["__fp"])
        g = g.append_column("dup_count",
                            pa.array(np.full(c, c, np.int64)))
        return g.append_column(
            "weight_ppm", pa.array(np.full(c, scale // c, np.int64)))

    base = ds.schema().base_schema
    out_schema = pa.schema(list(base) +
                           [pa.field("dup_count", pa.int64()),
                            pa.field("weight_ppm", pa.int64())])
    out_empty = out_schema.empty_table()

    def fold_typed(g: pa.Table) -> pa.Table:
        r = fold(g)
        return out_empty if r is None else r.select(out_schema.names)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__fp").map_groups(fold_typed, batch_format="pyarrow")
